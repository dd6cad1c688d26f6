"""Round-12 optimization, session-3 invariants: single-walk inits.

Pins that the symmetrize/init restructures removed the duplicate
executions of the expensive upstream plans (row VALUES stay pinned by
the oracle gate and the existing property tests — these tests pin the
execution-count invariant the bench win rests on):

- ``connected_components`` builds its symmetrized edge list from ONE
  walk of the pairs input (was: a union of two selects — the whole pair
  pipeline executed twice inside the eager checkpoint's job);
- ``pagerank`` / ``pagerank_fixed`` walk the raw edge plan exactly ONCE
  at init (was: ~4 walks — nodes union x2, out-degree, multiplicity
  groupBy — before anything was checkpointed);
- ``containment_pairs`` emits its two directions from ONE walk of the
  aggregated pair frame. (Measured nuance: the old fwd/rev union did
  NOT re-read the source — ReuseExchange deduped the plan up to the
  bucket shuffle — but it DID run the post-exchange pair-emit +
  aggregation once per direction; the explode emits both directions
  from one aggregation. The accumulator pin here guards the source
  walk; the duplicated-aggregation removal is visible in the plan.)

Each test wraps the operator input in a mapInPandas pass-through that
counts rows into an accumulator: the accumulator total equals (rows in
the input) x (executions of the input plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import dedup


def _counted(spark, df):
    """Return (df passed through a row-counting Arrow stage, accumulator)."""
    acc = spark.sparkContext.accumulator(0)
    schema = df.schema

    def bump(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    return df.mapInPandas(bump, schema), acc


def test_connected_components_single_walk_of_pairs(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 5)], "doc_a long, doc_b long"
    )
    counted, acc = _counted(spark, pairs)
    out = dedup.connected_components(counted)
    got = {(r["node"], r["component"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (5, 5)}
    # the pair input executed exactly once (the union formulation read
    # it twice: 8)
    assert acc.value == 4, acc.value


def test_pagerank_inits_single_walk_of_edges(spark):
    from market_data_pipeline_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank,
        pagerank_fixed,
    )

    rows = [
        ("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"),
        ("d", "a"), ("a", "c"), ("e", "e"),
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")

    counted, acc = _counted(spark, edges)
    fixed = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed(counted, iterations=4).collect()
    }
    assert acc.value == len(rows), acc.value
    # mass conservation sanity: ranks sum to SCALE up to the documented
    # <= n*1e-15-per-iteration floor-truncation leak
    assert 0 <= PAGERANK_SCALE - sum(fixed.values()) <= 5 * len(fixed) * 4

    counted2, acc2 = _counted(spark, edges)
    flt = {r["node"]: r["rank"] for r in pagerank(counted2, iterations=4).collect()}
    assert acc2.value == len(rows), acc2.value
    # float/fixed parity within the documented truncation bound
    for node, r_fp in fixed.items():
        assert flt[node] == pytest.approx(r_fp / PAGERANK_SCALE, abs=1e-9)


def test_containment_pairs_single_walk_and_transpose(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "the quick brown fox jumps over the lazy dog tonight ok", "en"),
            (3, "completely different words entirely here now", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    counted, acc = _counted(spark, docs)
    out = dedup.containment_pairs(counted, threshold=0.1).collect()
    # the docs input executes exactly once (held true under the old
    # fwd/rev union too, via ReuseExchange — this pins it stays true)
    assert acc.value == 3, acc.value
    rows = {(r["doc_id"], r["other_id"]): (r["common"], r["containment"]) for r in out}
    # both directions of each undirected pair are present with the SAME
    # common count and direction-specific containment denominators
    assert set(rows) == {(1, 2), (2, 1)}, rows
    c12, c21 = rows[(1, 2)], rows[(2, 1)]
    assert c12[0] == c21[0] > 0
    # doc 1's shingles are mostly inside doc 2 (prefix): containment of
    # 1-in-2 must exceed 2-in-1 (doc 2 has extra shingles)
    assert c12[1] > c21[1]
