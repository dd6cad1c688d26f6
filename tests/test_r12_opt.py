"""Round-12 optimization invariants.

Pins the semantics of the r12 fixed-cost optimizations:

- the stat-keyed parquet schema cache returns exactly the inference
  schema, and a REWRITTEN file (new stat) re-infers instead of serving
  the stale schema;
- ``ParquetTable.upsert_absent`` still reports exact inserted counts now
  that the count rides the write job via an Observation (including the
  zero-insert day);
- ``run_stream_to_memory`` honors an explicit durable checkpoint path;
- ``pagerank_fixed``'s join-free dangling aggregation returns exactly
  (node, rank_fp) with the same mass as the per-iteration-join version
  it replaced (value pin on a graph WITH a dangling node).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from market_data_pipeline_spark.sources import catalog as cat


def test_schema_cache_hit_matches_inference(spark, sf_dir, tmp_path):
    path = os.path.join(sf_dir, "lineitem.parquet")
    inferred = spark.read.parquet(path).schema
    first = cat.read_parquet_cached_schema(spark, path).schema
    second = cat.read_parquet_cached_schema(spark, path).schema  # cache hit
    assert first == inferred
    assert second == inferred


def test_schema_cache_invalidates_on_rewrite(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.range(3).select(F.col("id").alias("a")).write.parquet(p)
    s1 = cat.read_parquet_cached_schema(spark, p).schema
    assert [f.name for f in s1] == ["a"]
    # rewrite with a DIFFERENT schema at the same path: the stat key
    # (mtime_ns, size) changes, so the cache must re-infer
    import shutil

    shutil.rmtree(p)
    spark.range(3).select(
        F.col("id").alias("a"), F.lit("x").alias("b")
    ).write.parquet(p)
    spark.catalog.refreshByPath(p)
    s2 = cat.read_parquet_cached_schema(spark, p).schema
    assert [f.name for f in s2] == ["a", "b"]


def test_schema_cache_missing_path_raises_like_plain_reader(spark, tmp_path):
    missing = str(tmp_path / "nope.parquet")
    with pytest.raises(Exception):
        cat.read_parquet_cached_schema(spark, missing).schema


def test_upsert_absent_observed_counts(spark, tmp_path):
    from market_data_pipeline_spark.storage.table import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "tbl"), key=["k"])
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    assert t.upsert_absent(base) == 2  # bootstrap
    mixed = spark.createDataFrame([(2, "b"), (3, "c")], "k int, v string")
    assert t.upsert_absent(mixed) == 1  # one genuinely new
    assert t.upsert_absent(mixed) == 0  # zero-insert day (observed count)
    rows = {r["k"] for r in t.read_current().collect()}
    assert rows == {1, 2, 3}


def test_stream_explicit_checkpoint_param(spark, sf_dir, tmp_path):
    from market_data_pipeline_spark.streaming.jobs import (
        read_events_stream,
        run_stream_to_memory,
        streaming_tumbling,
    )

    ckpt = str(tmp_path / "ckpt")
    out = run_stream_to_memory(
        streaming_tumbling(read_events_stream(spark, sf_dir)),
        name="t_r12_ckpt_param",
        checkpoint_dir=ckpt,
    )
    assert out.count() > 0
    # the durable path is used (offsets/commits land there)
    assert os.path.isdir(os.path.join(ckpt, "offsets"))


def test_pagerank_fixed_dangling_mass_join_free(spark):
    from market_data_pipeline_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank_fixed,
    )

    # b and c are dangling (no out-edges) — the conditional-aggregate
    # path must redistribute their mass exactly as the old per-iteration
    # anti-join did. Reference values from the pure-python integer
    # recurrence (same as tests/test_properties_round9 pins).
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "a")], "src string, dst string"
    )
    out = pagerank_fixed(edges, iterations=3)
    assert out.columns == ["node", "rank_fp"]
    got = {r["node"]: r["rank_fp"] for r in out.collect()}

    # pure-python replay of the documented integer recurrence
    nodes = ["a", "b", "c", "d"]
    n = len(nodes)
    out_edges = {"a": ["b", "c"], "d": ["a"]}
    ranks = {v: PAGERANK_SCALE // n for v in nodes}
    base = (15 * PAGERANK_SCALE) // (100 * n)
    for _ in range(3):
        contrib = {v: 0 for v in nodes}
        for src, dsts in out_edges.items():
            d = len(dsts)
            r = ranks[src]
            for dst in dsts:
                contrib[dst] += (r // d) + ((r % d) * 1) // d
        dang = sum(ranks[v] for v in nodes if v not in out_edges)
        ranks = {
            v: base + (17 * (contrib[v] + dang // n)) // 20 for v in nodes
        }
    assert got == ranks
