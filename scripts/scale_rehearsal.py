"""100x-scale rehearsal for the two stateful scale stories (SCALE.md).

The sf0.1 bench proves correctness and plan shape; this script rehearses
the two operators whose cost is dominated by STATE rather than by scan
volume, at 10x the bench data, and validates the documented parameter
rules with measurements instead of argument:

A. **Streaming state-store partitioning** — `run_stream_to_memory`
   documents that state partitioning must be CHOSEN from state volume and
   executor count, never inherited from the batch shuffle setting. Runs
   the watermarked stream-stream view->click join over a 1M-event slice
   (10x the sf0.1 events table) at several state-partition counts and
   reports wall time + result-row equality.

B. **Capped dedup under a pathological hot shingle** — every document in
   a 50k-doc corpus (10x sf0.1 documents) is given one shared boilerplate
   sentence, so its trigram shingles occur in ALL 50k docs. The uncapped
   pair expansion for ONE such shingle is 50k^2/2 = 1.25e9 candidate rows
   in a single task — the run that must never happen. The rehearsal runs
   the capped pipeline (max_doc_freq) end-to-end, times it, and prints the
   `bucket_overflow_stats` audit: how many shingles the cap dropped and
   how many candidate pairs that refused to materialize.

Scratch data lives under .scratch/scale/ (gitignored) and is built once
with DuckDB (single-file parquet, matching the driver's layout so
`read_events_stream`'s pathGlobFilter finds it).

Usage: python scripts/scale_rehearsal.py [--events-copies 10] [--doc-copies 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "scale")
SRC = "/root/testdata/sf0.1"


def build_scratch(events_copies: int, doc_copies: int) -> None:
    """Scratch dirs embed the copy count so re-running at a different
    scale rebuilds instead of silently reusing the old slice."""
    import duckdb

    os.makedirs(os.path.join(SCRATCH, f"events_x{events_copies}"), exist_ok=True)
    os.makedirs(os.path.join(SCRATCH, f"hotdocs_x{doc_copies}"), exist_ok=True)
    con = duckdb.connect()
    ev_out = os.path.join(SCRATCH, f"events_x{events_copies}", "events.parquet")
    if not os.path.exists(ev_out):
        # replicate with disjoint user/event id ranges per copy: state
        # volume (distinct users buffered per watermark window) scales
        # with the copy count, which is the dimension under test
        con.execute(
            f"""
            COPY (
              SELECT event_id + i * 10000000 AS event_id, ts,
                     user_id + i * 10000000 AS user_id, event_type, value, props
              FROM '{SRC}/events.parquet', range({events_copies}) AS r(i)
            ) TO '{ev_out}' (FORMAT PARQUET)
            """
        )
    doc_out = os.path.join(SCRATCH, f"hotdocs_x{doc_copies}", "documents.parquet")
    if not os.path.exists(doc_out):
        # one boilerplate sentence appended to EVERY doc: its trigram
        # shingles have doc-frequency == corpus size (the viral shingle)
        con.execute(
            f"""
            COPY (
              SELECT doc_id + i * 10000000 AS doc_id,
                     text || ' subscribe to our newsletter for daily updates and offers' AS text,
                     lang, source, n_chars
              FROM '{SRC}/documents.parquet', range({doc_copies}) AS r(i)
            ) TO '{doc_out}' (FORMAT PARQUET)
            """
        )


def rehearse_streaming(spark, events_copies: int = 10) -> dict:
    from market_data_pipeline_spark.streaming import jobs as sj

    sf1 = os.path.join(SCRATCH, f"events_x{events_copies}")
    # warmup: one throwaway run at the bench-scale slice so the first
    # measured configuration doesn't absorb stream-source / state-store
    # class loading (~5s, measured)
    sj.run_stream_to_memory(
        sj.streaming_view_click_join(sj.read_events_stream(spark, SRC)),
        "rehearsal_warmup",
        output_mode="append",
        state_partitions=8,
    ).count()
    results: dict[str, dict] = {}
    for parts in (4, 8, 32):
        t0 = time.perf_counter()
        joined = sj.streaming_view_click_join(sj.read_events_stream(spark, sf1))
        out = sj.run_stream_to_memory(
            joined, f"rehearsal_{parts}", output_mode="append", state_partitions=parts
        )
        n = out.count()
        results[str(parts)] = {
            "state_partitions": parts,
            "wall_sec": round(time.perf_counter() - t0, 2),
            "rows": n,
        }
        print(f"  state_partitions={parts}: {results[str(parts)]}", flush=True)
    rows = {r["rows"] for r in results.values()}
    assert len(rows) == 1, f"result rows differ across partitionings: {results}"
    return results


def rehearse_capped_dedup(spark, max_doc_freq: int = 3, doc_copies: int = 10) -> dict:
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.operators import dedup
    from market_data_pipeline_spark.operators.util import bucket_overflow_stats

    docs = spark.read.parquet(
        os.path.join(SCRATCH, f"hotdocs_x{doc_copies}", "documents.parquet")
    )
    n_docs = docs.count()

    t0 = time.perf_counter()
    pairs = dedup.ngram_jaccard_pairs(
        docs, group_col="lang", n=3, threshold=0.1, max_doc_freq=max_doc_freq
    )
    n_pairs = pairs.count()
    capped_sec = round(time.perf_counter() - t0, 2)

    # audit: the same (group, shingle-hash) frame the operator buckets on
    sh = (
        dedup.shingled(docs, "doc_id", "text", 3, extra_cols=("lang",))
        .select(
            "doc_id", "lang", F.explode_outer("shingles").alias("_s")
        )
        .filter(F.col("_s").isNotNull())
        .select("doc_id", "lang", F.xxhash64("_s").alias("shingle"))
    )
    t1 = time.perf_counter()
    overflow = bucket_overflow_stats(sh, ["lang", "shingle"], max_doc_freq)
    audit = overflow.agg(
        F.count(F.lit(1)).alias("n_dropped_shingles"),
        F.max("group_size").alias("max_doc_freq_seen"),
        F.sum(
            (F.col("group_size") * (F.col("group_size") - 1) / 2).cast("double")
        ).alias("candidate_pairs_avoided"),
    ).collect()[0]
    audit_sec = round(time.perf_counter() - t1, 2)
    return {
        "n_docs": n_docs,
        "max_doc_freq": max_doc_freq,
        "capped_pipeline_sec": capped_sec,
        "confirmed_pairs": n_pairs,
        "audit_sec": audit_sec,
        "n_dropped_shingles": audit["n_dropped_shingles"],
        "max_doc_freq_seen": audit["max_doc_freq_seen"],
        "candidate_pairs_avoided": int(audit["candidate_pairs_avoided"] or 0),
    }


def rehearse_skew_join(spark, n_fact: int = 6_000_000, n_dim: int = 50_000) -> dict:
    """C. Skewed-key join: AQE's runtime skew split vs explicit salting.

    One key owns 50% of the fact rows (the hot-partition shape AQE's
    skew-join split was built for). The dim side is forced off the
    broadcast path (autoBroadcastJoinThreshold=-1) because that is the
    regime salting targets — a dim small enough to broadcast never needs
    either mechanism. Three configurations, identical results asserted:

    - naive: AQE skew split disabled — the one-task-owns-half-the-data
      baseline that motivates both mechanisms;
    - aqe: skew split enabled with thresholds lowered so the 10x slice
      actually trips it (at production partition sizes the defaults trip
      on their own);
    - salted: operators.skew.salted_join at R=32, AQE skew split off, so
      the measurement isolates the rewrite.
    """
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.operators.skew import salted_join

    fact = (
        spark.range(n_fact)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_dim)))
            .cast("long")
            .alias("k"),
            (F.col("id") % 1000).alias("v"),
            F.repeat(F.lit("x"), 32).alias("pad"),
        )
        .localCheckpoint()  # materialize so generation cost is out of the timings
    )
    dim = (
        spark.range(n_dim)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 97).cast("double").alias("w"),
            F.repeat(F.lit("y"), 32).alias("dim_pad"),
        )
        .localCheckpoint()
    )

    def run(tag: str, skew_on: bool, salted: bool) -> dict:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        # lowered so the 10x slice trips the split the way a production
        # partition (256MB default threshold) would on its own
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        t0 = time.perf_counter()
        if salted:
            joined = salted_join(fact, dim, on=["k"], salt_buckets=32)
        else:
            joined = fact.join(dim, "k")
        row = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * F.col("w")).alias("s"),
        ).collect()[0]
        out = {
            "wall_sec": round(time.perf_counter() - t0, 2),
            "rows": row["n"],
            "checksum": float(row["s"]),
        }
        print(f"  {tag}: {out}", flush=True)
        return out

    try:
        results = {
            "naive": run("naive (no skew split, no salt)", False, False),
            "aqe": run("aqe skew split", True, False),
            "salted": run("salted R=32", False, True),
        }
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    assert len({(r["rows"], r["checksum"]) for r in results.values()}) == 1, results
    return {"n_fact": n_fact, "n_dim": n_dim, "hot_key_share": 0.5, **results}


def rehearse_chained_streaming(spark, events_copies: int = 10) -> dict:
    """D. Chained stateful streaming (the st13 shape: dedup-agg ->
    count-agg, two state stores) at 10x the events volume, across state
    partition counts. The chained form doubles the per-micro-batch
    state-store commit count vs a single aggregation, so the
    state-partitioning rule (§A: choose from state volume, don't inherit
    the batch shuffle setting) matters twice as much here — this
    measures it on the two-operator topology."""
    from market_data_pipeline_spark.streaming import jobs as sj

    sf1 = os.path.join(SCRATCH, f"events_x{events_copies}")
    # warmup at bench scale (class loading / state-store init)
    sj.run_stream_to_memory(
        sj.streaming_distinct_users(sj.read_events_stream(spark, SRC)),
        "rehearsal_d_warmup",
        output_mode="append",
        state_partitions=8,
    ).count()
    results: dict[str, dict] = {}
    for parts in (4, 8, 32):
        t0 = time.perf_counter()
        out = sj.run_stream_to_memory(
            sj.streaming_distinct_users(sj.read_events_stream(spark, sf1)),
            f"rehearsal_d_{parts}",
            output_mode="append",
            state_partitions=parts,
        )
        n = out.count()
        results[str(parts)] = {
            "state_partitions": parts,
            "wall_sec": round(time.perf_counter() - t0, 2),
            "rows": n,
        }
        print(f"  state_partitions={parts}: {results[str(parts)]}", flush=True)
    rows = {r["rows"] for r in results.values()}
    assert len(rows) == 1, f"result rows differ across partitionings: {results}"
    return results


def rehearse_ivf_index(spark, vec_copies: int = 25, n_centroids: int = 32,
                       n_probe: int = 4) -> dict:
    """E. Persisted IVF index: pruned probes vs brute scan at scale.

    Replicates the sf0.1 embeddings ``vec_copies``x (disjoint ids,
    jittered vectors so copies aren't exact dups), builds the
    centroid-partitioned index once, then measures a 3-query top-10:
    brute force over the raw table vs the persisted index probing
    n_probe/n_centroids of the lists. The claim under test is the
    partition-pruning story: the probe's scan should touch ~n_probe/k of
    the corpus and beat brute wall time accordingly.
    """
    import numpy as np
    import pandas as pd

    from market_data_pipeline_spark.operators import similarity as sim
    from market_data_pipeline_spark.sources.catalog import load_table

    base = load_table(spark, SRC, "embeddings").toPandas()
    frames = []
    for i in range(vec_copies):
        c = base.copy()
        c["vec_id"] = c["vec_id"] + i * 10_000_000
        rng = np.random.default_rng(i)
        c["embedding"] = c["embedding"].map(
            lambda v: [float(x) + float(e) for x, e in
                       zip(v, rng.normal(scale=0.01, size=len(v)))]
        )
        frames.append(c)
    big_pd = pd.concat(frames, ignore_index=True)
    big = spark.createDataFrame(
        big_pd, "vec_id long, embedding array<double>, label int"
    ).localCheckpoint()
    n_vec = big.count()

    cents = big.filter(big.vec_id < n_centroids)
    queries = big.filter(big.vec_id.isin([0, 1, 2]))

    idx_path = os.path.join(SCRATCH, f"ivf_x{vec_copies}")
    import shutil

    shutil.rmtree(idx_path, ignore_errors=True)
    t0 = time.perf_counter()
    sim.build_ivf_index(big, idx_path, cents)
    build_sec = round(time.perf_counter() - t0, 2)

    t1 = time.perf_counter()
    brute = sim.knn_batch(big, queries, k=10).count()
    brute_sec = round(time.perf_counter() - t1, 2)

    t2 = time.perf_counter()
    probed = sim.query_ivf_index(
        spark, idx_path, queries, cents, k=10, n_probe=n_probe
    ).count()
    probe_sec = round(time.perf_counter() - t2, 2)

    return {
        "n_vectors": n_vec,
        "n_centroids": n_centroids,
        "n_probe": n_probe,
        "build_sec": build_sec,
        "brute_rows": brute,
        "brute_sec": brute_sec,
        "probe_rows": probed,
        "probe_sec": probe_sec,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events-copies", type=int, default=10)
    ap.add_argument("--doc-copies", type=int, default=10)
    ap.add_argument(
        "--only", choices=["A", "B", "C", "D", "E"], default=None,
        help="run a single section instead of all",
    )
    args = ap.parse_args()

    from market_data_pipeline_spark.session import get_spark

    if args.only in (None, "A", "B", "D"):
        build_scratch(args.events_copies, args.doc_copies)
    spark = get_spark("scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {}
    if args.only in (None, "A"):
        print(f"A. streaming state-store partitioning @ {args.events_copies}x events", flush=True)
        out["streaming"] = rehearse_streaming(spark, args.events_copies)
    if args.only in (None, "B"):
        print("B. capped dedup under a corpus-wide hot shingle", flush=True)
        out["capped_dedup"] = rehearse_capped_dedup(spark, doc_copies=args.doc_copies)
    if args.only in (None, "C"):
        print("C. skewed-key join: AQE split vs explicit salting", flush=True)
        out["skew_join"] = rehearse_skew_join(spark)
    if args.only in (None, "D"):
        print(f"D. chained stateful streaming @ {args.events_copies}x events", flush=True)
        out["chained_streaming"] = rehearse_chained_streaming(spark, args.events_copies)
    if args.only in (None, "E"):
        print("E. persisted IVF index: pruned probes vs brute scan", flush=True)
        out["ivf_index"] = rehearse_ivf_index(spark)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
