"""Tests for the stateful layer: upserts, set-based delisting updates,
versioned dedup, guarded delete, and the ParquetTable emulation of
ReplacingMergeTree semantics (SURVEY §1.3, §7 Phase 3)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import upsert as U
from market_data_pipeline_spark.storage.table import stock_master_table, stock_price_table

D = dt.date
TS = dt.datetime


def master_rows():
    return [
        ("000001", "Alpha", "KOSPI", D(2000, 1, 1), None, 1, TS(2024, 1, 1), TS(2024, 1, 1)),
        ("000002", "Beta", "KOSDAQ", D(2001, 1, 1), None, 1, TS(2024, 1, 1), TS(2024, 1, 1)),
        ("000003", "Gone", "KOSPI", D(2002, 1, 1), D(2020, 5, 1), 0, TS(2024, 1, 1), TS(2024, 1, 1)),
    ]


MASTER_COLS = [
    "symbol", "name", "market", "listing_date", "delisting_date", "is_active", "create_dt", "update_dt",
]


def master_df(spark):
    return spark.createDataFrame(master_rows(), MASTER_COLS)


def test_insert_if_absent(spark):
    existing = master_df(spark)
    incoming = spark.createDataFrame(
        [
            ("000002", "Beta-dup", "KOSDAQ", None, None, 1, TS(2024, 2, 1), TS(2024, 2, 1)),
            ("000009", "New", "KONEX", None, None, 1, TS(2024, 2, 1), TS(2024, 2, 1)),
        ],
        "symbol string, name string, market string, listing_date date, "
        "delisting_date date, is_active int, create_dt timestamp, update_dt timestamp",
    )
    out = U.insert_if_absent(existing, incoming, "symbol").collect()
    assert [r.symbol for r in out] == ["000009"]


def test_dedup_latest_keeps_max_version(spark):
    df = spark.createDataFrame(
        [
            ("000001", "old", TS(2024, 1, 1)),
            ("000001", "new", TS(2024, 3, 1)),
            ("000002", "only", TS(2024, 1, 1)),
        ],
        ["symbol", "name", "update_dt"],
    )
    out = {r.symbol: r.name for r in U.dedup_latest(df, "symbol").collect()}
    assert out == {"000001": "new", "000002": "only"}


def test_dedup_latest_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [("k", 1, TS(2024, 1, 1)), ("k", 2, TS(2024, 1, 1))], ["symbol", "v", "update_dt"]
    )
    out = U.dedup_latest(df, "symbol", tiebreak=["v"]).collect()
    assert out[0].v == 2  # max tiebreak wins, stable across replays


def test_apply_delistings_branches(spark):
    """The three branches of the reference's row loop, set-based
    (reference: scripts/sync_delisted_stocks.py:131-187): update active,
    skip already-delisted, insert unknown."""
    master = master_df(spark)
    delisted = spark.createDataFrame(
        [
            ("000001", "Alpha", "KOSPI", D(2024, 6, 1)),   # update
            ("000003", "Gone", "KOSPI", D(2024, 6, 1)),    # skip (already delisted)
            ("000007", "Phantom", "KONEX", D(2024, 6, 1)), # insert
        ],
        ["symbol", "name", "market", "delisting_date"],
    )
    updated, stats = U.apply_delistings(master, delisted)
    rows = {r.symbol: r for r in updated.collect()}
    st = stats.first()
    assert (st.updated, st.inserted, st.skipped) == (1, 1, 1)
    assert rows["000001"].is_active == 0 and rows["000001"].delisting_date == D(2024, 6, 1)
    assert rows["000003"].delisting_date == D(2020, 5, 1)  # untouched
    assert rows["000007"].is_active == 0 and rows["000007"].name == "Phantom"
    assert rows["000002"].is_active == 1  # untouched active row survives
    # invariant: is_active=0 <=> delisting_date set (FIXTURES.md A1)
    for r in rows.values():
        assert (r.is_active == 0) == (r.delisting_date is not None)


def test_guarded_delete_refuses_unconditional(spark):
    df = master_df(spark)
    with pytest.raises(ValueError):
        U.guarded_delete(df)


def price_rows():
    out = []
    for i, sym in enumerate(["000001", "000002"]):
        for d in range(1, 6):
            out.append(
                (sym, D(2024, 3, d), 100.0 + i + d, 1000 + d, 10_000 + d, TS(2024, 3, d), TS(2024, 3, d))
            )
    return out


PRICE_COLS = ["symbol", "trade_date", "close_price", "volume", "amount", "create_dt", "update_dt"]


def test_parquet_table_upsert_compact_delete(spark, tmp_path):
    t = stock_price_table(spark, str(tmp_path / "price"))
    df = spark.createDataFrame(price_rows(), PRICE_COLS)
    t.overwrite(df)
    assert t.read_raw().count() == 10

    # insert-if-absent: one duplicate key + one new key -> only new appended
    batch = spark.createDataFrame(
        [
            ("000001", D(2024, 3, 1), 999.0, 1, 1, TS(2024, 3, 9), TS(2024, 3, 9)),
            ("000001", D(2024, 3, 9), 111.0, 1, 1, TS(2024, 3, 9), TS(2024, 3, 9)),
        ],
        PRICE_COLS,
    )
    assert t.upsert_absent(batch) == 1
    assert t.read_raw().count() == 11

    # versioned overwrite via append + read_current dedup
    t.append(
        spark.createDataFrame(
            [("000001", D(2024, 3, 1), 555.0, 9, 9, TS(2024, 4, 1), TS(2024, 4, 1))], PRICE_COLS
        )
    )
    cur = t.read_current()
    row = cur.filter((F.col("symbol") == "000001") & (F.col("trade_date") == D(2024, 3, 1))).first()
    assert row.close_price == 555.0
    assert t.read_raw().count() == 12 and cur.count() == 11

    # OPTIMIZE FINAL: physical rewrite drops the stale version
    t.compact()
    assert t.read_raw().count() == 11

    # partition layout: monthly hive dirs exist
    assert any(p.name.startswith("trade_month=") for p in (tmp_path / "price").iterdir())

    # guarded delete of one symbol+range
    remaining = U.guarded_delete(t.read_raw(), symbol="000002", start_date="2024-03-01", end_date="2024-03-03")
    t.overwrite(remaining)
    assert t.read_raw().filter(F.col("symbol") == "000002").count() == 2


def test_master_table_replacing_semantics(spark, tmp_path):
    t = stock_master_table(spark, str(tmp_path / "master"))
    t.overwrite(master_df(spark))
    # re-crawl upsert: same keys -> nothing inserted (idempotent daily rerun,
    # reference: scripts/daily_stock_master_update.py:333-367)
    assert t.upsert_absent(master_df(spark)) == 0
    assert t.read_current().count() == 3


def test_migrate_csv_to_table(spark, tmp_path):
    """S9 — CSV staging bulk load into the managed layout."""
    import csv
    import datetime as dt

    from market_data_pipeline_spark.schemas import STOCK_PRICE
    from market_data_pipeline_spark.storage.table import (
        migrate_csv_to_table,
        stock_price_table,
    )

    csv_dir = tmp_path / "staging"
    csv_dir.mkdir()
    with open(csv_dir / "chunk0.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([c.name for c in STOCK_PRICE.fields])
        for i in range(5):
            w.writerow(
                [
                    f"{i:06d}", "2023-03-15", 1.0, 2.0, 0.5, 1.5,
                    100, 150, 1000, 0.01,
                    "2023-03-15T18:00:00", "2023-03-15T18:00:00",
                ]
            )

    t = stock_price_table(spark, str(tmp_path / "price"))
    n = migrate_csv_to_table(spark, str(csv_dir), t, schema=STOCK_PRICE)
    assert n == 5
    cur = t.read_current()
    assert cur.count() == 5
    row = cur.filter(F.col("symbol") == "000003").collect()[0]
    assert row.trade_date == dt.date(2023, 3, 15)
    assert row.close_price == 1.5


def test_delete_where_rewrites_only_affected_partitions(spark, tmp_path):
    """Partition surgery: untouched month directories keep their exact
    files (same inodes/mtimes) after a delete that targets one month."""
    import datetime as dt
    import os

    from market_data_pipeline_spark.operators.upsert import guarded_delete
    from market_data_pipeline_spark.storage.table import stock_price_table

    t = stock_price_table(spark, str(tmp_path / "price"))
    rows = [
        (s, dt.date(2023, m, 15), 10.0 * m, dt.datetime(2023, m, 15))
        for m in (1, 2, 3)
        for s in ("000001", "000002")
    ]
    df = spark.createDataFrame(
        rows, "symbol string, trade_date date, close_price double, update_dt timestamp"
    )
    t.overwrite(df)

    def files_of(month):
        d = tmp_path / "price" / f"trade_month={month}"
        return {f.name: os.stat(d / f.name).st_mtime_ns for f in d.iterdir()}

    before_feb = files_of("202302")
    t.delete_where(
        (F.col("symbol") == "000001") & (F.col("trade_date") >= F.lit("2023-03-01"))
    )
    # march rewritten, february byte-untouched
    assert files_of("202302") == before_feb
    cur = t.read_raw()
    assert cur.count() == 5
    assert cur.filter(
        (F.col("symbol") == "000001") & (F.col("trade_date") >= "2023-03-01")
    ).count() == 0


def test_compact_partition_selective(spark, tmp_path):
    import datetime as dt

    from market_data_pipeline_spark.storage.table import stock_price_table

    t = stock_price_table(spark, str(tmp_path / "price"))
    v1 = dt.datetime(2023, 1, 1, 9)
    v2 = dt.datetime(2023, 1, 1, 18)
    df = spark.createDataFrame(
        [
            ("000001", dt.date(2023, 1, 10), 1.0, v1),
            ("000001", dt.date(2023, 1, 10), 2.0, v2),  # newer version, same key
            ("000001", dt.date(2023, 2, 10), 3.0, v1),
        ],
        "symbol string, trade_date date, close_price double, update_dt timestamp",
    )
    t.overwrite(df)
    assert t.read_raw().count() == 3

    t.compact(partitions=["202301"])
    raw = t.read_raw()
    assert raw.count() == 2  # january deduped to the v2 row, february untouched
    jan = raw.filter(F.col("trade_date") == "2023-01-10").collect()
    assert len(jan) == 1 and jan[0].close_price == 2.0
    # read_current was already correct before and after (dedup-on-read)
    assert t.read_current().count() == 2


def test_dedup_latest_keeps_winning_rows_nulls(spark):
    """The argmax-aggregate form of dedup_latest must return the WINNING
    row's values verbatim — including its NULLs (max_by must not fall
    back to an older non-null value; delisting_date is legitimately NULL
    on the newest master row)."""
    from market_data_pipeline_spark.operators.upsert import dedup_latest

    df = spark.createDataFrame(
        [("A", 1, "old"), ("A", 2, None), ("B", 1, None), ("B", 2, "new")],
        "symbol string, update_dt int, name string",
    )
    out = {r["symbol"]: (r["update_dt"], r["name"])
           for r in dedup_latest(df, "symbol").collect()}
    assert out == {"A": (2, None), "B": (2, "new")}


def test_snapshot_time_travel_and_restore(spark, tmp_path):
    """Snapshots pin the table's exact state through later appends,
    overwrites, and compaction; restore rolls the live table back via
    the atomic stage-and-swap; hard-linked snapshot files survive the
    originals' deletion."""
    t = stock_price_table(spark, str(tmp_path / "price"))
    t.overwrite(spark.createDataFrame(price_rows(), PRICE_COLS))
    base_count = t.read_raw().count()

    t.snapshot("v1")
    assert t.snapshots() == ["v1"]

    # append after the snapshot: live grows, snapshot does not
    t.append(
        spark.createDataFrame(
            [("000099", D(2024, 3, 9), 50.0, 1, 1, TS(2024, 3, 9), TS(2024, 3, 9))],
            PRICE_COLS,
        )
    )
    assert t.read_raw().count() == base_count + 1
    assert t.read_snapshot("v1").count() == base_count

    # overwrite (deletes the original files) — the hard links keep v1 alive
    t.overwrite(spark.createDataFrame(price_rows()[:3], PRICE_COLS))
    assert t.read_raw().count() == 3
    assert t.read_snapshot("v1").count() == base_count

    # restore: live table back to v1 exactly (order-insensitive rows)
    t.restore("v1")
    got = {tuple(map(str, r)) for r in t.read_raw().collect()}
    want = {tuple(map(str, r)) for r in t.read_snapshot("v1").collect()}
    assert got == want and len(got) == base_count

    # duplicate tag refused; drop removes it
    import pytest as _pytest

    with _pytest.raises(FileExistsError):
        t.snapshot("v1")
    t.drop_snapshot("v1")
    assert t.snapshots() == []
    with _pytest.raises(FileNotFoundError):
        t.read_snapshot("v1")
