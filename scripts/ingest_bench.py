"""Ingest-throughput benchmark: the write path of the fact table.

The reference's only throughput metric is insert rows/sec into ClickHouse
via 10k-row batches on one connection (BASELINE.md: 1.76M rows logged for
340 symbols, sequential). This measures our equivalent: synthesize
price-shaped rows distributed, write the MergeTree-emulating layout
(monthly hive partitions + in-file (symbol, trade_date) sort, snappy),
report rows/sec end-to-end including the sort and partitioning.

Usage: python scripts/ingest_bench.py [n_rows] [target_dir]
Prints ONE JSON line {"metric": "ingest_rows_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from market_data_pipeline_spark.session import get_spark  # noqa: E402
from market_data_pipeline_spark.storage.table import stock_price_table  # noqa: E402


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    target = sys.argv[2] if len(sys.argv) > 2 else None
    tmp = None
    if target is None:
        tmp = tempfile.mkdtemp(prefix="ingest_bench_")
        target = os.path.join(tmp, "price")

    spark = get_spark("ingest-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    # ~5k symbols x ~5k trading days — the reference's production shape
    rows = spark.range(n_rows).select(
        F.lpad((F.col("id") % 5000).cast("string"), 6, "0").alias("symbol"),
        F.date_add(F.to_date(F.lit("1995-01-01")), ((F.col("id") * 37) % 7300).cast("int")).alias(
            "trade_date"
        ),
        (F.pmod(F.col("id") * 7919, F.lit(100000)) / 100.0 + 1000.0).alias("close_price"),
        F.pmod(F.col("id") * 104729, F.lit(10_000_000)).alias("volume"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400).alias("update_dt"),
    )

    table = stock_price_table(spark, target)
    t0 = time.perf_counter()
    table.overwrite(rows)
    elapsed = time.perf_counter() - t0
    written = spark.read.parquet(target).count()

    # same write WITHOUT the in-file (symbol, trade_date) sort — isolates
    # what the clustered layout costs at ingest (r5 verdict #7: the sort
    # buys row-group min/max pruning on read; record what it costs on
    # write so the trade is a measured number, not an assumption)
    nosort_dir = target + "_nosort"
    staged = rows.withColumn(
        "trade_month", F.date_format("trade_date", "yyyyMM")
    ).repartition(F.col("trade_month"))
    t1 = time.perf_counter()
    staged.write.mode("overwrite").partitionBy("trade_month").parquet(nosort_dir)
    elapsed_nosort = time.perf_counter() - t1

    print(
        json.dumps(
            {
                "metric": "ingest_rows_per_sec",
                "value": round(written / elapsed),
                "unit": "rows/sec",
                "rows": written,
                "elapsed_sec": round(elapsed, 2),
                "layout": "hive trade_month partitions, sortWithinPartitions(symbol, trade_date), snappy",
                "nosort_rows_per_sec": round(written / elapsed_nosort),
                "nosort_elapsed_sec": round(elapsed_nosort, 2),
                "sort_overhead_pct": round(
                    100.0 * (elapsed - elapsed_nosort) / elapsed_nosort, 1
                ),
            }
        )
    )
    if tmp:
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        shutil.rmtree(nosort_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
