"""100x rehearsal for the ParquetTable compaction path (r8 verdict #5).

§G.2 covered the dd/ts/k/e query families at 100x; the storage layer's
ReplacingMergeTree-style compaction (storage/table.py:compact — the
pipeline1/a10 shape) had only sf0.1 evidence. This builds a versioned,
month-partitioned table from the events frame at TWO scales (sf0.1's
100k events and the cached §G 100x frame's 10M events), appends a
50%-overlap second version wave, and times:

- ``compact(max_concurrency=8)`` — per-partition latest-version
  rewrite with overlapped rewrite jobs (the sequential loop measured
  ~0.44s fixed job overhead per partition: 115 partitions -> 50.7s of
  mostly scheduling; concurrency is the fix this rehearsal motivated)
- ``read_current()`` — the read-side dedup the compaction amortizes

The design claim under test: compaction cost is ONE dedup window + one
write per TOUCHED partition, linear in partition bytes and parallel
across partitions — no superlinear term, because versions of a key
never span partitions (the dedup key contains the partition-deriving
column's source). Correctness is asserted (row counts before/after,
no stale versions survive), not just timed.

Usage: python scripts/storage_compaction_100x.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCALE100 = os.path.join(REPO, ".scratch", "scale10")  # 100x frame (§G.2)
SF01 = "/root/testdata/sf0.1"
SCRATCH = os.path.join(REPO, ".scratch", "compaction_100x")


def rehearse(spark, src: str, label: str) -> dict:
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.sources.catalog import load_table
    from market_data_pipeline_spark.storage.table import ParquetTable

    path = os.path.join(SCRATCH, label)
    shutil.rmtree(path, ignore_errors=True)
    ev = load_table(spark, src, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    t = ParquetTable(
        spark,
        path,
        key=["event_id"],
        version_col="ver",
        partition_col="m",
        partition_expr=F.date_format(F.col("ts"), "yyyy-MM"),
        sort_cols=["event_id"],
    )
    out: dict = {}
    t0 = time.perf_counter()
    t.overwrite(ev.withColumn("ver", F.lit(1)))
    out["load_v1_s"] = round(time.perf_counter() - t0, 2)
    # second wave: every even event_id gets an updated version (50%)
    t0 = time.perf_counter()
    t.append(
        ev.filter(F.col("event_id") % 2 == 0).withColumn("ver", F.lit(2))
    )
    out["append_v2_s"] = round(time.perf_counter() - t0, 2)
    n_total = ev.count()
    raw_before = t.read_raw().count()
    assert raw_before == n_total + n_total // 2 + (n_total % 2 == 0) * 0, (
        raw_before,
        n_total,
    )
    t0 = time.perf_counter()
    cur = t.read_current().count()
    out["read_current_pre_s"] = round(time.perf_counter() - t0, 2)
    assert cur == n_total, (cur, n_total)
    t0 = time.perf_counter()
    t.compact(max_concurrency=8)
    out["compact_s"] = round(time.perf_counter() - t0, 2)
    raw_after = t.read_raw().count()
    assert raw_after == n_total, (raw_after, n_total)
    # no stale version survives compaction
    stale = t.read_raw().filter(
        (F.col("event_id") % 2 == 0) & (F.col("ver") != 2)
    ).count()
    assert stale == 0, stale
    t0 = time.perf_counter()
    cur2 = t.read_current().count()
    out["read_current_post_s"] = round(time.perf_counter() - t0, 2)
    assert cur2 == n_total
    out["rows"] = n_total
    out["partitions"] = len(t._partition_values())
    shutil.rmtree(path, ignore_errors=True)
    return out


def main() -> int:
    import json

    from market_data_pipeline_spark.session import get_spark

    if not os.path.exists(os.path.join(SCALE100, "events.parquet")):
        sys.exit("build the 100x frame first: scripts/scale_rehearsal_g.py --copies 100")
    os.makedirs(SCRATCH, exist_ok=True)
    spark = get_spark("compaction-100x")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    out = {}
    out["sf0.1"] = rehearse(spark, SF01, "sf01")
    print("sf0.1:", json.dumps(out["sf0.1"]), flush=True)
    out["x100"] = rehearse(spark, SCALE100, "x100")
    print("x100: ", json.dumps(out["x100"]), flush=True)
    import math

    r = out["x100"]["compact_s"] / out["sf0.1"]["compact_s"]
    n = out["x100"]["rows"] / out["sf0.1"]["rows"]
    print(
        f"compact ratio {r:.1f}x for {n:.0f}x rows "
        f"(observed exponent {math.log(r) / math.log(n):.2f})"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
