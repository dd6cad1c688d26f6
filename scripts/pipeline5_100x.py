"""100x rehearsal for pipeline5's chained streaming ingest (§G.5).

§G.5 argued pipeline5's 100 TB posture by composition of already-
rehearsed bounds (stateless floor, watermark-bounded dedup state,
open-windows agg state). This measures the CHAIN itself — the one
thing composition can't prove is that two stateful operators back to
back behave like their parts:

- sf0.1 events (100k rows) and the §G 100x frame (10M rows, 100x
  users/event-ids), each doubled through the at-least-once union so
  the dedup stage carries the full id universe in state;
- state_partitions in {8, 32}, asserting RESULT VALUES identical
  across partitionings (partitioning must be pure cost, never
  semantics — the §A rule), and reporting the wall ratio next to the
  100x data ratio.

availableNow over a single directory is ONE micro-batch, so dedup
state peaks at the whole id universe (10M keys at 100x) before any
watermark eviction — deliberately the worst case; a production
deployment with rolling triggers holds only keys-per-horizon.

Usage: python scripts/pipeline5_100x.py
(build the 100x frame first: scripts/scale_rehearsal_g.py --copies 100)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALE100 = os.path.join(REPO, ".scratch", "scale10")
SF01 = "/root/testdata/sf0.1"


def run_chain(spark, sf_dir: str, parts: int, tag: str):
    from market_data_pipeline_spark.streaming import jobs as sj

    s1 = sj.read_events_stream(spark, sf_dir)
    s2 = sj.read_events_stream(spark, sf_dir)
    stream = sj.streaming_ingest_pipeline(s1.unionByName(s2))
    return sj.run_stream_to_memory(
        stream, f"p5_{tag}", output_mode="append",
        state_partitions=parts, timeout_sec=2400,
    )


def value_hash(df) -> tuple[int, int]:
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
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
    spark = get_spark("pipeline5-100x")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    results: dict = {}
    for label, src in (("sf0.1", SF01), ("x100", SCALE100)):
        hashes = {}
        for parts in (8, 32):
            tag = f"{label.replace('.', '')}_{parts}"
            t0 = time.perf_counter()
            df = run_chain(spark, src, parts, tag)
            hashes[parts] = value_hash(df)
            wall = round(time.perf_counter() - t0, 2)
            results[f"{label}/p{parts}"] = {
                "wall_s": wall, "rows": hashes[parts][0],
            }
            print(
                f"pipeline5 {label} parts={parts}: {wall}s "
                f"rows={hashes[parts][0]}",
                flush=True,
            )
            spark.catalog.dropTempView(f"p5_{tag}")
        assert hashes[8] == hashes[32], (
            f"{label}: partitioning changed VALUES", hashes
        )
        print(f"  pipeline5 {label}: values identical across partitionings")

    print("\n" + json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
