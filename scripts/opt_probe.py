"""Isolated per-query optimization probe (round 12).

For each named query: build the plan, dump `.explain("formatted")` to
plans/r12/<name>_<tag>.txt, then time N noop-sink runs (bench.py
methodology: full-plan noop write, forced driver GC between reps,
best-of-N is the reproducible cost).

Usage:
  python scripts/opt_probe.py [--tag before|after] [--reps 3] [--sf DIR] name...
  python scripts/opt_probe.py --tag before --top 20       # slowest by BENCHQ
"""

from __future__ import annotations

import argparse
import contextlib
import gc
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from market_data_pipeline_spark.plans.driver_queries import QUERIES  # noqa: E402
from market_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default=None, help="write plans/r12/<name>_<tag>.txt")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=0, help="probe the N slowest by BENCHQ_r12")
    ap.add_argument("--plans-dir", default="r13", help="plans/<dir>/ for --tag dumps")
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        q = json.load(open(os.path.join(here, "BENCHQ_r12.json")))["queries"]
        names += [n for n, _ in sorted(q.items(), key=lambda kv: -kv[1])[: args.top]]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    import pandas as pd  # noqa: F401
    from pyspark.sql.pandas.functions import pandas_udf

    def _noop(x):
        return x

    _noop.__annotations__ = {"x": pd.Series, "return": pd.Series}
    spark.range(0, 3200, 1, 32).select(pandas_udf(_noop, "long")("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.plans_dir,
    )
    results = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"probe: {name}")
        if args.tag:
            os.makedirs(plans_dir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        reps = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.mode("overwrite").format("noop").save()
            reps.append(round(time.perf_counter() - t0, 3))
            gc.collect()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
        results[name] = min(reps)
        print(f"{name:40s} best={min(reps):6.2f}  reps={reps}", flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
