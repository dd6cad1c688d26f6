"""Arrow-UDF bench-noise probe (r10 verdict #2).

dd3_minhash_lsh measured 1.9-9.1s on IDENTICAL code across bench
sessions — a 2-4x band that makes per-query BENCHQ diffs useless for
regression detection on UDF-heavy queries without hand re-probes. The
hypothesis is Python-worker / GC state accumulated over a long
session, so this harness reproduces the long-session regime instead of
probing isolated (isolated best-of-2 already reproduces the pins):

  1. build ONE session under a candidate config,
  2. AGE it by running N UDF-heavy queries once each (the long-bench
     state: hundreds of Arrow stages through the same worker pool),
  3. time each TARGET query `--reps` times, recording EVERY rep (the
     spread is the signal, not the min).

Run one config per process:

  python scripts/udf_noise_probe.py --label baseline
  python scripts/udf_noise_probe.py --label no-reuse \
      --conf spark.python.worker.reuse=false
  python scripts/udf_noise_probe.py --label arrow-2k \
      --conf spark.sql.execution.arrow.maxRecordsPerBatch=2048
  python scripts/udf_noise_probe.py --label rewarm --rewarm

Prints one JSON line: {label, conf, aging_n, targets: {name: [secs]}}.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# UDF-heavy aging set: every query here drives Arrow python workers
# (pandas_udf / applyInPandas / mapInPandas paths).
AGING = [
    "dd1_exact_dedup", "dd2_ngram_jaccard", "dd4_simhash_pairs",
    "dd5_cosine_near_dup", "dd7_dup_clusters", "dd8_dedup_corpus",
    "dd10_dedup_keep_best", "dd13_span_dedup", "dd18_shingle_df_profile",
    "k1_knn_topk", "k2_knn_batch", "k3_knn_lsh", "k6_knn_graph",
    "k15_label_confusion", "k18_text_ann_end_to_end", "k20_label_knn_purity",
    "tx4_fingerprint", "tx29_bpe_merges", "sd1_semantic_dedup",
    "e24_event_pagerank", "apx1_approx_distinct", "smp4_weighted_sample",
]

TARGETS = ["dd3_minhash_lsh", "k16_simplified_silhouette", "k4_knn_ivf",
           "e11_rfm_scores"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", required=True)
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf key=value (builder-time)")
    ap.add_argument("--rewarm", action="store_true",
                    help="run a noop pandas-UDF stage before EVERY timed rep")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--aging", type=int, default=len(AGING))
    args = ap.parse_args()

    extra = dict(kv.split("=", 1) for kv in args.conf)

    from market_data_pipeline_spark.session import get_spark

    spark = get_spark(f"udf-noise-{args.label}", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd  # noqa: F401
    from pyspark.sql.pandas.functions import pandas_udf

    def _noop(x: "pd.Series") -> "pd.Series":
        return x

    _noop.__annotations__ = {"x": pd.Series, "return": pd.Series}

    def warm() -> None:
        spark.range(0, 3200, 1, 32).select(
            pandas_udf(_noop, "long")("id")
        ).write.mode("overwrite").format("noop").save()

    warm()  # session fixed cost, same as bench.py

    from __spark_entry__ import queries

    qs = queries()

    for name in AGING[: args.aging]:
        qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        gc.collect()

    out: dict[str, list[float]] = {}
    for name in TARGETS:
        reps = []
        for _ in range(args.reps):
            if args.rewarm:
                warm()
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            reps.append(round(time.perf_counter() - t0, 2))
            gc.collect()
        out[name] = reps

    print(json.dumps({
        "label": args.label, "conf": extra, "rewarm": args.rewarm,
        "aging_n": args.aging, "sf_dir": SF_DIR, "targets": out,
    }))


if __name__ == "__main__":
    main()
