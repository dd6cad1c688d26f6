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
    # ONE aggregation pass over the raw edge plan; nodes and out-degrees
    # derive from the (small) grouped multiset, not from ``e`` — the old
    # init walked the full upstream edge pipeline ~4x (nodes union x2,
    # out_deg, the multiplicity groupBy) before anything was
    # checkpointed (r12 opt session 3, guide §1.2/§5).
    grouped = (
        e.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_m"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        grouped.select(F.col("src").alias("node"))
        .unionByName(grouped.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank", F.lit(None).cast("double"))
    # per-(src, dst) edge weight = multiplicity / out-degree(src);
    # out-degree = raw edge count per src = sum of multiplicities
    out_deg = grouped.groupBy("src").agg(F.sum("_m").alias("_deg"))
    norm_edges = (
        grouped.join(out_deg, "src")
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


#: Fixed-point scale for :func:`pagerank_fixed` — rank mass carried as
#: BIGINT multiples of 1e-15. All intermediates stay far inside int64:
#: ranks sum to <= SCALE, per-edge contributions decompose as
#: (r div d)*m + ((r mod d)*m) div d with m <= d (multiplicity never
#: exceeds out-degree), so the largest product is max(r, d*m) — safe
#: while per-node out-degree stays below ~3e9 edges (d*m <= d^2 < 2^63).
PAGERANK_SCALE = 10**15


def pagerank_fixed(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank with damping 0.85 in EXACT integer fixed-point — the
    engine-reproducible variant of :func:`pagerank`.

    Same plan shape per iteration (one join + one map-combined
    aggregate, checkpointed edge invariant, broadcast dangling scalar),
    but every quantity is a BIGINT multiple of 1e-15 and every division
    is integral with floor semantics:

        contrib(src->dst) = (r div d) * m + ((r mod d) * m) div d
                          = floor(r * m / d)          (exact identity)
        r' = floor(0.15 * SCALE / n)
             + (17 * (in + dang div n)) div 20        (0.85 = 17/20)

    Integer addition is associative, so the result is independent of
    partitioning, shuffle order and engine — DuckDB's recursive-CTE
    oracle reproduces it bit-for-bit, which is what upgrades
    e24_event_pagerank from rows-only to value-hash-gated. The floor
    truncations leak <= n*1e-15 mass per iteration, so ranks differ
    from the float formulation by < 1e-12 after 10 iterations (pinned
    against the float path and a pure-python integer reference in
    pytest).

    Returns (node, rank_fp BIGINT); rank = rank_fp / PAGERANK_SCALE.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # Same one-pass init as :func:`pagerank`: the grouped multiset is
    # the only walk of the raw edge plan; nodes/out-degrees derive from
    # it (r12 opt session 3). out-degree = SUM of integer
    # multiplicities = the old per-src row count, exactly.
    grouped = (
        e.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("_m"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        grouped.select(F.col("src").alias("node"))
        .unionByName(grouped.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank_fp", F.lit(None).cast("long"))
    out_deg = grouped.groupBy("src").agg(F.sum("_m").alias("_deg"))
    norm_edges = (
        grouped.join(out_deg, "src")
        .localCheckpoint(eager=False)  # loop invariant: built exactly once
    )
    # DANGLING membership (no out-edges) is a loop invariant: compute it
    # ONCE as a boolean column carried on the node/rank frames, instead
    # of re-deriving the set inside every iteration (the old loop ran a
    # distinct + anti-join + aggregate per iteration for a set that
    # never changes — r12 opt, guide §2.4 "remove shuffles outright").
    # The per-iteration dangling mass is now a join-free map-combined
    # conditional aggregate over the ranks frame.
    nodes = nodes.join(
        norm_edges.select("src").distinct(),
        nodes.node == F.col("src"),
        "left",
    ).select(
        "node", F.col("src").isNull().alias("_dang")
    ).localCheckpoint(eager=False)

    ranks = nodes.select(
        F.col("node"),
        F.lit(PAGERANK_SCALE // n_nodes).cast("long").alias("rank_fp"),
        F.col("_dang"),
    ).localCheckpoint(eager=False)

    base_fp = (15 * PAGERANK_SCALE) // (100 * n_nodes)
    for i in range(iterations):
        flowed = (
            ranks.join(norm_edges, ranks.node == norm_edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(
                    F.expr("rank_fp DIV _deg") * F.col("_m")
                    + F.expr("(rank_fp % _deg) * _m DIV _deg")
                ).alias("_in")
            )
        )
        dangling = ranks.agg(
            F.coalesce(
                F.sum(F.when(F.col("_dang"), F.col("rank_fp"))), F.lit(0)
            ).cast("long").alias("_d")
        )
        ranks = (
            nodes.join(flowed, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base_fp)
                    + F.expr(
                        f"17 * (coalesce(_in, 0) + _d DIV {n_nodes}) DIV 20"
                    )
                ).cast("long").alias("rank_fp"),
                "_dang",
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", "rank_fp")


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
