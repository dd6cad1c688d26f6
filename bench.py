"""Benchmark harness: runs the oracle-checked query surface at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (computes the
full plan, no driver collect and no disk I/O in the measurement).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from market_data_pipeline_spark.plans.driver_queries import QUERIES  # noqa: E402
from market_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    # The driver parses stdout as JSON; anything the JVM launcher or a
    # stray library prints to fd 1 breaks that (BENCH_r01 recorded
    # "parsed": null despite an intact JSON line in the tail).  Redirect
    # the OS-level stdout to stderr for the entire run and keep a dup of
    # the real stdout for the single JSON line at the end.
    real_stdout_fd = os.dup(1)
    sys.stdout.flush()
    os.dup2(2, 1)

    spark = get_spark("mdps-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/session so the first measured query doesn't pay startup
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm the Arrow python workers too: the FIRST pandas-UDF stage of a
    # session forks one worker per core (~5s on 32 cores even with the
    # preloading daemon); that's session fixed cost, not query cost
    import pandas as pd  # noqa: F401
    from pyspark.sql.pandas.functions import pandas_udf

    def _noop(x: "pd.Series") -> "pd.Series":
        return x

    _noop.__annotations__ = {"x": pd.Series, "return": pd.Series}
    spark.range(0, 3200, 1, 32).select(pandas_udf(_noop, "long")("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    # best-of-2 per query: single-shot numbers on a busy box swing 3-4x
    # (GC, page cache, JIT); the min is the reproducible cost of the plan
    import gc

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 2)
        # drop python-side DataFrame refs so the ContextCleaner can free
        # localCheckpoint blocks between queries — without this the block
        # manager grows monotonically over the 100+-query session and GC
        # pressure inflates the late queries' timings
        gc.collect()

    total = round(sum(timings.values()), 2)
    # Truncation defense (BENCH_r02 recorded "parsed": null because the
    # driver's tail capture clipped the head of the 113-entry line):
    # summary fields FIRST, per-family subtotals next, per-query dict last;
    # compact separators + 2-decimal times keep the whole line well under a
    # 4 KiB tail buffer so it parses end-to-end.
    families: dict[str, float] = {}
    for name, t in timings.items():
        fam = re.match(r"[a-z]+", name).group(0)
        families[fam] = round(families.get(fam, 0.0) + t, 2)
    line = json.dumps(
        {
            "metric": "total_query_wall_time",
            "value": total,
            "unit": "sec",
            "sf": sf_from_dir(SF_DIR),
            "n_queries": len(timings),
            "families": families,
            "queries": timings,
        },
        separators=(",", ":"),
    )
    sys.stdout.flush()
    sys.stderr.flush()
    os.dup2(real_stdout_fd, 1)
    os.close(real_stdout_fd)
    print(line, flush=True)
    # Tail-truncation defense (r3 verdict #2): the driver keeps a *tail*
    # buffer of stdout, so a >4 KiB main line gets its HEAD clipped — which
    # is where r3 put the summary. Emit a second, short, summary-only JSON
    # line AFTER the main line: the end of the output always parses, and
    # the totals are recoverable from BENCH_r{N}.json without git
    # archaeology even when the per-query dict is clipped.
    print(
        json.dumps(
            {
                "bench_total_sec": total,
                "n_queries": len(timings),
                "sf": sf_from_dir(SF_DIR),
                "families": families,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
