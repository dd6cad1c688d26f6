"""Skew performance rehearsal (r7 verdict #3, performance half): time
the join/window/shuffle-heavy representatives on UNIFORM sf0.1 vs a
SKEWED sf0.1 clone (scripts/skew_sweep.build_skewed: ~50% of rows on
one hot key per dimension), with AQE on vs off, and classify each
query:

  skew-insensitive  skewed/uniform < 1.5x with AQE on
  aqe-rescued       AQE on beats AQE off by >1.3x under skew
  skew-sensitive    skewed/uniform >= 1.5x even with AQE on
                    -> candidate for operators/skew.salted_join or a
                       two-phase (salted partial -> final) aggregation

AQE's skew handling splits oversized SORT-MERGE JOIN partitions; it
does NOT split a skewed WINDOW partition (one user owning half the
event log still serializes that window on one task) — that class is
expected to show up skew-sensitive here and is the documented salting
territory. Results are recorded in BENCHNOTES.md (round 8).

Usage: python scripts/skew_bench.py [query ...]
Prints a markdown table; always exits 0 (measurement, not a gate).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(REPO, ".scratch", "skew_tables_sf01")

# join-heavy, window-heavy, and candidate-generation-heavy representatives
DEFAULT = [
    "j7_revenue_by_nation",        # fact x dim broadcast joins
    "j9_salted_join",              # the already-salted showcase
    "j12_nation_top_customers",    # join + per-group top-k
    "tpch_q13_customer_distribution",  # outer join on the skewed custkey
    "e3_sessionize",               # per-user window (hot user)
    "e11_rfm_scores",              # per-user aggregate + ntile
    "e15_session_paths",           # per-user ordered collect
    "dd2_ngram_jaccard",           # shingle buckets (hot text)
    "ts1_sma",                     # per-symbol rolling window (hot symbol)
    "ts9_rolling_corr",            # symbol-pair windows
    "ts25_xs_momentum",            # cross-sectional rank by date
    "a27_monthly_hhi",             # share-of-group aggregation
]


def _time(fn, spark, sf_dir) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    from skew_sweep import build_skewed

    from market_data_pipeline_spark.plans.driver_queries import QUERIES
    from market_data_pipeline_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    if not os.path.exists(os.path.join(SCRATCH, "lineitem.parquet")):
        print(f"building skewed clone of {SRC} -> {SCRATCH}", file=sys.stderr)
        build_skewed(src=SRC, scratch=SCRATCH)

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    rows = []
    for name in names:
        fn = QUERIES[name]
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        uniform = _time(fn, spark, SRC)
        skew_aqe = _time(fn, spark, SCRATCH)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        skew_noaqe = _time(fn, spark, SCRATCH)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        ratio = skew_aqe / uniform if uniform else float("inf")
        aqe_gain = skew_noaqe / skew_aqe if skew_aqe else float("inf")
        if ratio < 1.5:
            verdict = "skew-insensitive" if aqe_gain < 1.3 else "aqe-rescued"
        else:
            verdict = "aqe-rescued" if aqe_gain >= 1.3 else "SKEW-SENSITIVE"
        rows.append((name, uniform, skew_aqe, skew_noaqe, ratio, aqe_gain, verdict))
        print(
            f"{name:32s} uniform={uniform:6.2f}s skew+aqe={skew_aqe:6.2f}s "
            f"skew-aqe={skew_noaqe:6.2f}s ratio={ratio:4.2f} "
            f"aqe_gain={aqe_gain:4.2f} {verdict}",
            file=sys.stderr,
        )

    print("| query | uniform s | skew+AQE s | skew-AQE s | skew/uniform | AQE gain | verdict |")
    print("|---|---|---|---|---|---|---|")
    for name, u, sa, sn, r, g, v in rows:
        print(f"| {name} | {u:.2f} | {sa:.2f} | {sn:.2f} | {r:.2f}x | {g:.2f}x | {v} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
