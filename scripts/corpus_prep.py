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


def prepare_corpus(
    spark,
    docs,
    benchmark=None,
    min_tokens: int = 5,
    jaccard_bands: int = 16,
    chunk_tokens: int = 64,
    overlap: int = 16,
    n_shards: int = 8,
    min_ascii_ratio: float | None = None,
    min_ttr: float | None = None,
    max_dup_sentence_ratio: float | None = None,
):
    """Run the full prep pipeline on a documents DataFrame.

    Returns (chunks_df_with_shards, stage_counts dict). Library entry so
    tests drive the identical composition the CLI runs.

    The optional round-5 gates are OFF by default (None): a minimum
    printable-ASCII ratio (binary-spill / mojibake floor — leave off for
    intentionally multilingual corpora), a minimum type-token ratio
    (template/repetition floor), and a maximum within-doc duplicate-
    sentence ratio (boilerplate floor). All three are map-only column
    expressions folded into the same quality scan.
    """
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.operators import dedup, text as tx

    counts = {"input": docs.count()}

    # 1. quality floor: drop empty/ultra-short docs (permissive default —
    # quality scoring is advisory, hard floors only remove degenerate rows)
    q = docs.filter(tx.token_count(F.col("text")) >= min_tokens)
    if min_ascii_ratio is not None:
        kept = F.length(F.regexp_replace(F.col("text"), r"[^\x20-\x7E]", ""))
        q = q.filter(kept >= min_ascii_ratio * F.length(F.col("text")))
    if min_ttr is not None:
        toks = F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"[ \t\n\x0B\f\r]+"), lambda x: x != ""
        )
        q = q.filter(
            F.size(F.array_distinct(toks)) >= min_ttr * F.size(toks)
        )
    if max_dup_sentence_ratio is not None:
        sents = F.filter(
            F.transform(
                F.split(F.trim(F.col("text")), r"[.!?]+"), lambda s: F.trim(s)
            ),
            lambda s: s != "",
        )
        q = q.filter(
            (F.size(sents) == 0)
            | (
                F.size(sents) - F.size(F.array_distinct(sents))
                <= max_dup_sentence_ratio * F.size(sents)
            )
        )
    # the survivor set feeds four downstream consumers (exact dedup,
    # minhash, cluster survivor join, chunking) — materialize once
    q = q.localCheckpoint(eager=False)
    counts["after_quality"] = q.count()

    # 2. exact dedup (first occurrence per identical text)
    exact_keep = dedup.exact_dedup(q).select("doc_id")
    q2 = q.join(exact_keep, "doc_id", "left_semi").localCheckpoint(eager=False)
    counts["after_exact_dedup"] = q2.count()

    # 3. near-dup clusters -> keep the LONGEST member per cluster
    pairs = dedup.minhash_lsh_pairs(q2, bands=jaccard_bands, max_bucket_size=200)
    comp = dedup.connected_components(pairs)
    clustered = q2.join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
    from pyspark.sql import Window

    # Survivor pick partitions by a key that gives every NON-clustered doc
    # (component NULL — typically the vast majority of the corpus) its own
    # singleton window partition. Partitioning by bare "component" would
    # funnel all NULLs into ONE window partition — the single-task global
    # window shape the plan-audit tests forbid, and a guaranteed straggler
    # at 100 TB even though the when() discards the value. The prefixes
    # keep a singleton whose doc_id happens to equal a cluster's
    # representative id (CC components are min-node doc_ids) from being
    # merged into that cluster's partition, which bare
    # coalesce(component, doc_id) would do.
    part_key = F.coalesce(
        F.concat(F.lit("c:"), F.col("component").cast("string")),
        F.concat(F.lit("d:"), F.col("doc_id").cast("string")),
    )
    w = Window.partitionBy(part_key).orderBy(
        F.desc(tx.token_count(F.col("text"))), "doc_id"
    )
    survivors = (
        clustered.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "component")
    )
    survivors = survivors.localCheckpoint(eager=False)
    counts["after_near_dedup"] = survivors.count()

    # 4. optional decontamination against a benchmark table
    if benchmark is not None:
        flags = dedup.decontaminate(survivors, benchmark)
        clean_ids = flags.filter(~F.col("contaminated")).select("doc_id")
        survivors = survivors.join(clean_ids, "doc_id", "left_semi")
        survivors = survivors.localCheckpoint(eager=False)
        counts["after_decontaminate"] = survivors.count()

    # 5. context chunking + shard assignment (chunk key rides along so a
    # loader worker reads exactly its shard, in a deterministic order)
    chunks = tx.chunk_documents(
        survivors, chunk_tokens=chunk_tokens, overlap=overlap
    ).withColumn(
        "chunk_key",
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("chunk_idx")),
    )
    shards = tx.shuffle_shards(chunks, key_col="chunk_key", n_shards=n_shards)
    out = chunks.join(shards, "chunk_key").select(
        "doc_id", "chunk_idx", "chunk_text", "n_tokens", "shard", "pos"
    )
    counts["chunks"] = out.count()
    return out, counts


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
