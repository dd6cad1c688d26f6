"""FinanceDataReader-style listing source (SURVEY §2.1 S4).

The reference loads per-market stock listings via
``fdr.StockListing('KOSPI'/'KOSDAQ'/'KONEX'/'ETF')`` — a pandas frame per
market, tagged with a market literal, with an ETF failure tolerated
(reference: src/setup/load_stock_master_clickhouse.py:26-89,
scripts/daily_stock_master_update.py:50-76).

``financedatareader`` is not installed in this environment, so the fetch
is behind an injectable ``fetcher(market) -> pandas.DataFrame`` — the
default tries the real import and raises a clear error otherwise. Tests
inject frames; the pipeline layer (plans.pipelines.update_listed_stocks)
consumes the per-market dict this produces.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MARKETS = ("KOSPI", "KOSDAQ", "KONEX", "ETF")

# fdr.StockListing column names -> canonical (reference renames Code/Name,
# scripts/daily_stock_master_update.py:82-85; Sector/Industry feed the
# legacy richer master schema, reference src/setup/setup_clickhouse.py:73-87)
LISTING_RENAME = {
    "Code": "symbol",
    "Name": "name",
    "Symbol": "symbol",
    "Sector": "sector",
    "Industry": "industry",
}


def _default_fetcher(market: str) -> pd.DataFrame:
    try:
        import FinanceDataReader as fdr  # noqa: N813
    except ImportError as e:
        raise NotImplementedError(
            "FinanceDataReader is not installed in this environment; "
            "inject a fetcher(market) -> pandas.DataFrame instead"
        ) from e
    return fdr.StockListing(market)


class FdrListingSource:
    """S4 — per-market listing frames as Spark DataFrames.

    A failing market is tolerated (the reference ignores ETF failures);
    ``fetch_all`` returns the dict the daily pipeline consumes.
    """

    def __init__(
        self,
        spark: SparkSession,
        fetcher: Callable[[str], pd.DataFrame] | None = None,
    ):
        self.spark = spark
        self.fetcher = fetcher or _default_fetcher

    def fetch_market(self, market: str) -> DataFrame:
        pdf = self.fetcher(market)
        pdf = pdf.rename(columns={k: v for k, v in LISTING_RENAME.items() if k in pdf.columns})
        if not {"symbol", "name"} <= set(pdf.columns):
            raise ValueError(f"listing frame for {market} lacks symbol/name: {list(pdf.columns)}")
        cols = [c for c in ("symbol", "name", "sector", "industry") if c in pdf.columns]
        # Null-safe str conversion: .astype(str) would stringify NaN/None to
        # the literals "nan"/"None", which empty_to_null never nulls — real
        # listings (ETFs, KONEX) frequently have missing sector/industry.
        clean = pdf[cols].copy()
        for c in cols:
            clean[c] = clean[c].map(lambda v: None if pd.isna(v) else str(v))
        sdf = self.spark.createDataFrame(
            clean, schema=", ".join(f"{c} string" for c in cols)
        )
        return sdf.withColumn("market", F.lit(market))

    def fetch_all(self, markets=MARKETS) -> dict[str, DataFrame]:
        out: dict[str, DataFrame] = {}
        for m in markets:
            try:
                out[m] = self.fetch_market(m)
            except Exception:
                # ETF (or any market) failure tolerated — reference:
                # src/setup/load_stock_master_clickhouse.py:62-70
                continue
        return out
