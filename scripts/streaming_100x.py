"""100x rehearsal for the stateful streaming family (r8 verdict #5).

§G.2 covered the dd/ts/k/e query families at 100x and SCALE.md §A
covered the stream-stream join at 10x/100x; the two remaining streaming
shapes with only sf0.1 evidence are:

- st1  — watermarked tumbling window aggregation (windowed HashAggregate
  state; the canonical "hourly rollup" topology)
- st10 — ``applyInPandasWithState`` per-user running stats (one Arrow
  stateful store, state cardinality = distinct users: 1.5k at sf0.1,
  150k at 100x)

Both run to completion (availableNow) on sf0.1 AND the cached §G 100x
frame (10M events, 100x users) at state_partitions in {8, 32}, timing
each and asserting the RESULT VALUES are identical across partitionings
(partitioning must be pure cost, never semantics). The design claim
under test is the §A rule: the optimal state partitioning GROWS with
state volume — at sf0.1 the fixed per-store-per-batch commit cost makes
8 beat 32, and at 100x the per-group Arrow work dominates so 32 must
win. Observed exponents land in SCALE.md §A.1.

Usage: python scripts/streaming_100x.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALE100 = os.path.join(REPO, ".scratch", "scale10")  # 100x frame (§G.2)
SF01 = "/root/testdata/sf0.1"


def run_st1(spark, sf_dir: str, parts: int, tag: str):
    from market_data_pipeline_spark.streaming import jobs as sj

    stream = sj.streaming_tumbling(
        sj.read_events_stream(spark, sf_dir), duration="1 hour",
        keys=["event_type"],
    )
    return sj.run_stream_to_memory(
        stream, f"st1_{tag}", state_partitions=parts, timeout_sec=1200
    )


def run_st10(spark, sf_dir: str, parts: int, tag: str):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.streaming import jobs as sj

    stream = sj.streaming_running_stats(sj.read_events_stream(spark, sf_dir))
    out = sj.run_stream_to_memory(
        stream, f"st10_{tag}", output_mode="update",
        state_partitions=parts, timeout_sec=1200,
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def value_hash(df) -> tuple[int, int]:
    """(row count, order-independent value hash) of a result frame."""
    from pyspark.sql import functions as F

    cols = [c for c in sorted(df.columns)]
    h = df.select(
        F.xxhash64(*[F.col(c).cast("string") for c in cols]).alias("h")
    )
    row = h.agg(
        F.count("*").alias("n"),
        F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return int(row["n"]), int(row["s"] or 0)


def main() -> int:
    from market_data_pipeline_spark.session import get_spark

    if not os.path.exists(os.path.join(SCALE100, "events.parquet")):
        sys.exit(
            "build the 100x frame first: scripts/scale_rehearsal_g.py --copies 100"
        )
    spark = get_spark("streaming-100x")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    results: dict = {}
    for qname, runner in (("st1", run_st1), ("st10", run_st10)):
        for label, src in (("sf0.1", SF01), ("x100", SCALE100)):
            hashes = {}
            for parts in (8, 32):
                tag = f"{qname}_{label.replace('.', '')}_{parts}"
                t0 = time.perf_counter()
                df = runner(spark, src, parts, tag)
                hashes[parts] = value_hash(df)
                wall = round(time.perf_counter() - t0, 2)
                results[f"{qname}/{label}/p{parts}"] = {
                    "wall_s": wall,
                    "rows": hashes[parts][0],
                }
                print(
                    f"{qname} {label} parts={parts}: {wall}s "
                    f"rows={hashes[parts][0]}",
                    flush=True,
                )
                spark.catalog.dropTempView(f"{qname}_{tag}")
            assert hashes[8] == hashes[32], (
                f"{qname}/{label}: partitioning changed VALUES", hashes
            )
            print(f"  {qname} {label}: values identical across partitionings")

    print("\n" + json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
