"""Plan-BUILD census (round 12 optimization): time fn(spark, SF_DIR)
alone — python + py4j + analysis work, no action — for every query.

Eager queries (pipelines, streaming, anything that runs jobs inside the
builder) are included but their numbers mean "builder wall", not plan
build; the report marks queries whose build ran Spark jobs.

Usage:
  python scripts/build_census.py [--sf DIR] [--out FILE] [--profile name]

--profile runs cProfile over ONE query's build and prints the top
cumulative entries (where does the py4j time go).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from market_data_pipeline_spark.plans.driver_queries import QUERIES  # noqa: E402
from market_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="/tmp/build_census.json")
    ap.add_argument("--profile", default=None)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("build-census")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    if args.profile:
        import cProfile
        import pstats

        fn = QUERIES[args.profile]
        fn(spark, args.sf)  # warm (imports, schema cache)
        pr = cProfile.Profile()
        pr.enable()
        fn(spark, args.sf)
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(40)
        return

    sc = spark.sparkContext
    results: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        reps = []
        ran_jobs = False
        for _ in range(args.reps):
            j0 = sc._jsc.sc().dagScheduler().nextJobId()  # AtomicInteger unboxes to int via py4j
            t0 = time.perf_counter()
            fn(spark, args.sf)
            reps.append(time.perf_counter() - t0)
            j1 = sc._jsc.sc().dagScheduler().nextJobId()
            if j1 > j0:
                ran_jobs = True
        results[name] = {
            "build_sec": round(min(reps), 4),
            "eager": ran_jobs,
        }
    total = round(sum(r["build_sec"] for r in results.values()), 2)
    lazy_total = round(
        sum(r["build_sec"] for r in results.values() if not r["eager"]), 2
    )
    with open(args.out, "w") as fh:
        json.dump(
            {"total_build_sec": total, "lazy_build_sec": lazy_total, "queries": results},
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"total build {total}s  lazy-only {lazy_total}s -> {args.out}")
    top = sorted(results.items(), key=lambda kv: -kv[1]["build_sec"])[:30]
    for n, r in top:
        print(f"{r['build_sec']:8.3f} {'EAGER' if r['eager'] else '     '} {n}")


if __name__ == "__main__":
    main()
