"""Round-2 additions: partition-bytes introspection, delisting_reason
carried to the canonical master, and the scale-safe r5 plan shape."""

from __future__ import annotations

import datetime as dt
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from plan_audit import audit_plan  # noqa: E402

from market_data_pipeline_spark.plans.driver_queries import QUERIES  # noqa: E402
from market_data_pipeline_spark.plans.pipelines import sync_delisted_stocks  # noqa: E402
from market_data_pipeline_spark.schemas import RAW_DELISTED  # noqa: E402
from market_data_pipeline_spark.storage.table import (  # noqa: E402
    stock_master_table,
    stock_price_table,
)

D = dt.date
TS = dt.datetime


# --- partition_stats (system.parts analog) -----------------------------------


def test_partition_stats_reports_bytes_and_rows(spark, tmp_path):
    t = stock_price_table(spark, str(tmp_path / "price"))
    rows = []
    for m, n_days in ((1, 3), (2, 5)):
        for d in range(1, n_days + 1):
            rows.append(
                ("000001", D(2024, m, d), 10.0, TS(2024, m, d), TS(2024, m, d))
            )
    df = spark.createDataFrame(
        rows, "symbol string, trade_date date, close_price double, "
        "create_dt timestamp, update_dt timestamp"
    )
    t.overwrite(df)
    stats = {r.trade_month: r for r in t.partition_stats().collect()}
    assert set(stats) == {"202401", "202402"}
    assert stats["202401"].rows == 3 and stats["202402"].rows == 5
    for r in stats.values():
        assert r.n_files >= 1 and r.bytes > 0


def test_partition_stats_requires_partitioned_table(spark, tmp_path):
    t = stock_master_table(spark, str(tmp_path / "master"))
    with pytest.raises(ValueError):
        t.partition_stats()


# --- delisting_reason end-to-end ---------------------------------------------


def test_sync_delisted_carries_delisting_reason(spark, tmp_path):
    master = stock_master_table(spark, str(tmp_path / "master"))
    raw = spark.createDataFrame(
        [
            ("감자회사", "123456", "2024.06.01", "상장폐지 사유", "비고", "1", "KOSPI"),
            ("무사유", "654321", "20240701", None, None, "2", "KOSDAQ"),
        ],
        RAW_DELISTED,
    )
    report = sync_delisted_stocks(master, raw, now=TS(2024, 7, 2, 9, 0, 0))
    assert report["inserted"] == 2
    rows = {r.symbol: r for r in master.read_current().collect()}
    assert rows["123456"].delisting_reason == "상장폐지 사유"
    assert rows["123456"].is_active == 0
    assert rows["654321"].delisting_reason is None
    # the column exists in the canonical schema, not just on these rows
    assert "delisting_reason" in master.read_current().columns


def test_apply_delistings_tolerates_legacy_master_without_reason(spark):
    from market_data_pipeline_spark.operators.upsert import apply_delistings

    legacy = spark.createDataFrame(
        [("000001", "Old", "KOSPI", None, None, 1, TS(2024, 1, 1), TS(2024, 1, 1))],
        "symbol string, name string, market string, listing_date date, "
        "delisting_date date, is_active int, create_dt timestamp, update_dt timestamp",
    )
    delisted = spark.createDataFrame(
        [("000001", "Old", "KOSPI", D(2024, 6, 1), "reason-x")],
        "symbol string, name string, market string, delisting_date date, "
        "delisting_reason string",
    )
    updated, _stats = apply_delistings(legacy, delisted)
    row = updated.collect()[0]
    assert row.delisting_reason == "reason-x" and row.is_active == 0


# --- r5 plan shape: no single-task global window -----------------------------


def test_r5_has_no_single_partition_exchange(spark):
    facts = audit_plan(QUERIES["r5_symbol_deciles"](spark, "/root/testdata/sf0.001"))
    assert facts["single_partition_exchanges"] == 0


# --- ping (drift-intent helper) ----------------------------------------------


def test_ping(spark):
    from market_data_pipeline_spark.sources.catalog import ping

    assert ping(spark) is True


def test_compact_files_merges_slivers(spark, tmp_path):
    t = stock_price_table(spark, str(tmp_path / "price"))
    # 6 appends -> >=6 sliver files in one month directory
    for d in range(1, 7):
        t.append(
            spark.createDataFrame(
                [("000001", D(2024, 1, d), float(d), TS(2024, 1, d), TS(2024, 1, d))],
                "symbol string, trade_date date, close_price double, "
                "create_dt timestamp, update_dt timestamp",
            )
        )
    before = {r.trade_month: r.n_files for r in t.partition_stats().collect()}
    assert before["202401"] >= 6
    rewritten = t.compact_files(target_bytes=1 << 30)  # everything fits one file
    assert rewritten == {"202401": 1}
    after = {r.trade_month: (r.n_files, r.rows) for r in t.partition_stats().collect()}
    assert after["202401"] == (1, 6)
    # data intact
    assert t.read_raw().count() == 6
    # second run is a no-op
    assert t.compact_files(target_bytes=1 << 30) == {}


def test_sync_new_listings_carries_industry(spark, tmp_path):
    from market_data_pipeline_spark.plans.pipelines import sync_new_listings
    from market_data_pipeline_spark.schemas import RAW_NEW_LISTING

    master = stock_master_table(spark, str(tmp_path / "master"))
    raw = spark.createDataFrame(
        [
            (
                "새회사", "111111", "2024.03.02", "KOSPI", "NEW", "전자부품",
                "500원", "10,000원", "100억", "부품", "1,000,000", "증권사",
                "대한민국", "1", "KOSPI",
            )
        ],
        RAW_NEW_LISTING,
    )
    inserted = sync_new_listings(master, raw, now=TS(2024, 3, 3))
    assert inserted == 1  # bootstrap reports the written row count
    row = master.read_current().collect()[0]
    assert row.industry == "전자부품"
    assert row.sector is None  # new-listing crawl has no sector source
    assert "sector" in master.read_current().columns


def test_fdr_source_carries_sector_industry(spark):
    import pandas as pd

    from market_data_pipeline_spark.sources.fdr import FdrListingSource

    def fetcher(market):
        return pd.DataFrame(
            {
                "Code": ["000001"],
                "Name": ["Co"],
                "Sector": ["Tech"],
                "Industry": ["Semis"],
            }
        )

    out = FdrListingSource(spark, fetcher=fetcher).fetch_market("KOSPI")
    row = out.collect()[0]
    assert (row.sector, row.industry, row.market) == ("Tech", "Semis", "KOSPI")
