"""CLI: the end-to-end training-corpus preparation pipeline.

Chains the LLM-data operators the way a user actually runs them against
one documents table: quality filter -> exact dedup -> MinHash near-dup
clustering with keep-longest survivors -> optional benchmark
decontamination -> context chunking -> shuffle-sharded write. Each stage
is the already-tested operator; this script is only composition, config,
and the stage-count audit trail (one JSON line on stdout).

Usage:
  python scripts/corpus_prep.py --input /root/testdata/sf0.001/documents.parquet \\
      --output /tmp/corpus_out [--benchmark eval.parquet] \\
      [--min-tokens 5] [--chunk-tokens 64] [--overlap 16] [--shards 8]

At 100 TB each stage keeps its documented shape (hash-keyed shuffles,
capped buckets, checkpointed edge lists); run per ingest partition and
raise --shards to the loader's worker count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# prepare_corpus moved to plans.pipelines (r10): plans own compositions,
# scripts stay thin. Re-exported here so existing imports keep working.
from market_data_pipeline_spark.plans.pipelines import prepare_corpus  # noqa: E402,F401


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="output dir (parquet, partitioned by shard)")
    ap.add_argument("--benchmark", default=None, help="optional eval parquet to decontaminate against")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--chunk-tokens", type=int, default=64)
    ap.add_argument("--overlap", type=int, default=16)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--min-ascii-ratio", type=float, default=None,
                    help="drop docs below this printable-ASCII ratio (off by default)")
    ap.add_argument("--min-ttr", type=float, default=None,
                    help="drop docs below this type-token ratio (off by default)")
    ap.add_argument("--max-dup-sentence-ratio", type=float, default=None,
                    help="drop docs above this duplicate-sentence ratio (off by default)")
    args = ap.parse_args()

    from market_data_pipeline_spark.session import get_spark

    spark = get_spark("corpus-prep")
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(args.input)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None

    out, counts = prepare_corpus(
        spark,
        docs,
        benchmark=bench,
        min_tokens=args.min_tokens,
        chunk_tokens=args.chunk_tokens,
        overlap=args.overlap,
        n_shards=args.shards,
        min_ascii_ratio=args.min_ascii_ratio,
        min_ttr=args.min_ttr,
        max_dup_sentence_ratio=args.max_dup_sentence_ratio,
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(args.output)
    counts["output"] = args.output
    print(json.dumps(counts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
