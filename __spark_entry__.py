"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual query surface lives in
``market_data_pipeline_spark.plans.driver_queries`` — one entry per
operator family from SURVEY §2 plus the Phase-6 LLM-pipeline extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from market_data_pipeline_spark.plans.driver_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the per-market daily
    summary (broadcast fact⋈dim join + grouped exact aggregation)."""
    from market_data_pipeline_spark.plans.driver_queries import a6_daily_market_summary

    return a6_daily_market_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
