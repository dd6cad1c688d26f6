"""Master-data maintenance: upserts, set-based updates, versioned dedup.

Emulates the reference's three mutation idioms (SURVEY §1.3) on immutable
storage:

1. insert-if-absent (reference: scripts/daily_stock_master_update.py:258-294)
   -> left-anti join + append;
2. in-place column update (reference: src/clickhouse/stock_master.py:95-111)
   -> set-based outer join + when/otherwise branch columns (replacing the
   reference's row-at-a-time loop at scripts/sync_delisted_stocks.py:131-187);
3. ReplacingMergeTree(update_dt) + OPTIMIZE FINAL
   (reference: src/clickhouse/stock_master.py:28,289-297)
   -> window row_number compaction.

All functions are pure DataFrame -> DataFrame; persistence is in
``storage.table``. At scale, the anti-join's build side is the *incoming*
batch (small) so Spark broadcasts it; compaction shuffles once on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def insert_if_absent(existing: DataFrame, incoming: DataFrame, key: str | list[str]) -> DataFrame:
    """Rows of ``incoming`` whose key is not present in ``existing``.

    (reference: scripts/daily_stock_master_update.py:264-283 — Polars
    ``~is_in`` anti-filter; J5/U3.) The reference collects the existing key
    set into Python; here the anti-join stays distributed.
    """
    keys = [key] if isinstance(key, str) else list(key)
    return incoming.join(existing.select(*keys).distinct(), keys, "left_anti")


def dedup_latest(
    df: DataFrame,
    key: str | list[str],
    version_col: str = "update_dt",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep the max-version row per key — ReplacingMergeTree read/merge
    semantics (reference: src/clickhouse/stock_master.py:28,196-202 — A10,
    W4).

    ReplacingMergeTree keeps an arbitrary row among equal versions; we
    instead make the ordering total via ``tiebreak`` columns (desc) so
    replayed compactions are byte-identical (required for golden tests).

    Executed as a sort-free ``max_by`` argmax aggregate over the
    (version, tiebreaks...) struct — all orderings are DESC, so the
    lexicographic struct max IS the window's first row. An aggregate
    combines map-side: the merge shuffle carries one partial row per
    (key, map partition) instead of every version, and no per-partition
    sort exists — this is the compaction read path, where that
    difference is the whole job.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ord_key = F.struct(F.col(version_col), *[F.col(t) for t in (tiebreak or [])])
    aggs = [
        F.max_by(c, ord_key).alias(c) for c in df.columns if c not in keys
    ]
    return df.groupBy(*keys).agg(*aggs).select(*df.columns)


def apply_delistings(
    master: DataFrame,
    delisted: DataFrame,
    default_listing_market: str = "KOSPI",
) -> tuple[DataFrame, DataFrame]:
    """Set-based replacement for the reference's row loop over crawled
    delisted rows (reference: scripts/sync_delisted_stocks.py:119-196 and
    src/clickhouse/stock_master.py:95-189 — J6 eliminated).

    ``delisted`` columns: (symbol, name, market, delisting_date[,
    delisting_reason]). Returns ``(updated_master, stats)`` where stats has
    one row with columns (updated, inserted, skipped):

    - symbol in master and active      -> UPDATE delisting_date/reason, is_active=0
    - symbol in master, already delisted -> skip (keep existing row)
    - symbol not in master             -> INSERT as delisted row

    The legacy richer-schema columns (sector / industry /
    delisting_reason, reference: src/setup/setup_clickhouse.py:73-87)
    ride along when either side has them; a master written before the
    columns existed reads as all-null. sector/industry are preserved from
    the master (the delisted crawl doesn't carry them); delisting_reason
    is taken from the crawl on update/insert.
    """
    d_reason = (
        F.col("delisting_reason")
        if "delisting_reason" in delisted.columns
        else F.lit(None).cast("string")
    )
    d = delisted.select(
        "symbol",
        F.col("name").alias("_d_name"),
        F.col("market").alias("_d_market"),
        F.col("delisting_date").alias("_d_date"),
        d_reason.alias("_d_reason"),
    )
    for c in ("sector", "industry", "delisting_reason"):
        if c not in master.columns:
            master = master.withColumn(c, F.lit(None).cast("string"))
    # Both consumers of the full-outer join — the returned updated-master
    # frame (whose action is the table overwrite) and the stats aggregate
    # (collected for the run report) — share ONE materialization via a
    # lazy localCheckpoint (r12 opt): without it the join (master read +
    # shuffle) executed twice, once per action. The stats collect runs
    # first in the sync flow, materializing the checkpoint from the
    # PRE-overwrite files; the staged write then reuses the blocks.
    joined = master.join(d, "symbol", "full_outer").localCheckpoint(eager=False)
    in_master = F.col("is_active").isNotNull()
    is_update = in_master & (F.col("is_active") == 1) & F.col("_d_date").isNotNull()
    is_insert = ~in_master

    updated = joined.select(
        "symbol",
        F.coalesce(F.col("name"), F.col("_d_name"), F.lit("Unknown")).alias("name"),
        F.coalesce(F.col("market"), F.col("_d_market"), F.lit(default_listing_market)).alias("market"),
        F.col("sector"),
        F.col("industry"),
        F.col("listing_date"),
        F.when(is_update | is_insert, F.col("_d_date"))
        .otherwise(F.col("delisting_date"))
        .alias("delisting_date"),
        F.when(is_update | is_insert, F.coalesce(F.col("_d_reason"), F.col("delisting_reason")))
        .otherwise(F.col("delisting_reason"))
        .alias("delisting_reason"),
        F.when(is_update | is_insert, F.lit(0))
        .otherwise(F.col("is_active"))
        .cast("int")
        .alias("is_active"),
        F.coalesce(F.col("create_dt"), F.current_timestamp()).alias("create_dt"),
        F.when(is_update | is_insert, F.current_timestamp())
        .otherwise(F.col("update_dt"))
        .alias("update_dt"),
    )
    stats = joined.agg(
        F.count(F.when(is_update, 1)).alias("updated"),
        F.count(F.when(is_insert, 1)).alias("inserted"),
        F.count(F.when(in_master & (F.col("is_active") == 0) & F.col("_d_date").isNotNull(), 1)).alias(
            "skipped"
        ),
    )
    return updated, stats


def guarded_delete(
    df: DataFrame,
    symbol: str | None = None,
    start_date: str | None = None,
    end_date: str | None = None,
) -> DataFrame:
    """Delete rows matching the predicate; refuse an unconditional delete.

    (reference: src/clickhouse/price_client.py:249-273 — S10, guard clause
    preserved verbatim in spirit.)
    """
    preds = []
    if symbol is not None:
        preds.append(F.col("symbol") == F.lit(symbol))
    if start_date is not None:
        preds.append(F.col("trade_date") >= F.lit(start_date))
    if end_date is not None:
        preds.append(F.col("trade_date") <= F.lit(end_date))
    if not preds:
        raise ValueError("refusing unconditional DELETE: provide symbol and/or date range")
    keep = ~preds[0]
    for p in preds[1:]:
        keep = keep | ~p
    return df.filter(keep)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two snapshots of a keyed table: one row
    per key that was added, removed, or changed, with the old/new values
    of the compared columns.

    The storage layer here rewrites immutable parquet snapshots (stage-
    and-swap, see storage/table.py), so "what changed between yesterday's
    table and today's" is a first-class maintenance question — this is the
    set-based answer: a single full outer join on the key, change class
    derived with null-safe comparisons (``eqNullSafe``: a NULL->value
    transition IS a change). Unchanged keys are dropped as early as
    possible so the output is |delta|, not |table|.

    Returns (key..., change: added|removed|changed, old_<c>/new_<c> per
    compared column).
    """
    keys = [key] if isinstance(key, str) else list(key)
    compare_cols = compare_cols or [c for c in old.columns if c not in keys]
    o = old.select(*keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]).withColumn(
        "_in_old", F.lit(True)
    )
    n = new.select(*keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]).withColumn(
        "_in_new", F.lit(True)
    )
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *keys,
            "change",
            *[c for p in compare_cols for c in (f"old_{p}", f"new_{p}")],
        )
    )
