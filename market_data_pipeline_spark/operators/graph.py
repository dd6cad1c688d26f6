"""Iterative graph algorithms on DataFrames (extension family).

The dedup module already runs one fixed-point algorithm (connected
components, `operators/dedup.py`); this module adds the other canonical
distributed iteration — PageRank — expressed the way iterative
algorithms must be written on Spark to survive scale:

- each iteration is ONE join + ONE aggregate (rank mass flows along
  edges, partials map-combine before the shuffle);
- the edge list is the loop invariant: normalized once, checkpointed
  once, and reused every iteration (never recomputed through lineage);
- ranks are localCheckpoint-ed every few iterations to cut the lineage
  chain — without this, iteration N replans and re-executes all N-1
  predecessors (the classic iterative-Spark failure mode);
- dangling-node mass (nodes with no out-edges) is redistributed via a
  single-row aggregate broadcast, not a driver loop.

The driver holds nothing but the iteration counter; all data stays
distributed. Convergence is by fixed iteration count (the standard
batch formulation); a delta-based stop would add one tiny aggregate per
iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over a directed edge list (duplicate edges act as
    weights). Returns (node, rank) with ranks summing to ~1.

    Cost per iteration: one hash join of ranks⋈edges on the source key
    plus one map-combined aggregate on the destination — the minimal
    shuffle pair for rank flow. The normalized edge frame (src, dst,
    out-degree share) is computed once and checkpointed; rank frames are
    checkpointed every ``checkpoint_every`` iterations so plan depth
    stays bounded by the checkpoint interval, not the iteration count.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(None).cast("double"))
    # per-(src, dst) edge weight = multiplicity / out-degree(src)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    norm_edges = (
        e.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_m"))
        .join(out_deg, "src")
        .select("src", "dst", (F.col("_m") / F.col("_deg")).alias("share"))
        .localCheckpoint(eager=False)  # loop invariant: built exactly once
    )
    ranks = nodes.select(
        F.col("node"), F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint(eager=False)

    base = (1.0 - damping) / n_nodes
    for i in range(iterations):
        flowed = (
            ranks.join(norm_edges, ranks.node == norm_edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("share")).alias("_in"))
        )
        # dangling mass: rank sitting on nodes with no out-edges is
        # redistributed uniformly — one scalar aggregate, broadcast
        dangling = (
            ranks.join(norm_edges.select("src").distinct(),
                       ranks.node == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_d"))
        )
        ranks = (
            nodes.join(flowed, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_d") / n_nodes)
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def session_follow_edges(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Edge list for the event-type follow graph: one edge per
    consecutive event pair within a user's stream (A -> B whenever B
    immediately follows A). One per-user lag window — the e9 transition
    pattern emitted as edges instead of probabilities, ready for
    :func:`pagerank`."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    return (
        events.select(
            F.lag(type_col).over(w).alias("src"), F.col(type_col).alias("dst")
        )
        .filter(F.col("src").isNotNull())
    )
