"""Embedding similarity search (SURVEY §7 Phase 6).

Brute-force cosine top-k as the correctness baseline, LSH-bucketed
(random hyperplane) as the scale path. Vectors are ``array<float>``
columns; all arithmetic is JVM-side ``F.aggregate``/``F.zip_with`` over
double-cast elements — deterministic sequential accumulation (which also
makes results reproducible against a SQL oracle), no UDFs.

At 100 TB: brute force against a single query vector is a map-only scan +
TakeOrdered (no shuffle); batch-query mode broadcasts the query set; the
LSH variant prunes candidates with an equi-join on (plane-sign bucket).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
) -> DataFrame:
    """Top-k rows by cosine similarity to a literal query vector.

    Map-only scan + per-partition heap (TakeOrderedAndProject): scales
    linearly with no shuffle. Cosine is rounded (default 6 dp) so ordering
    and golden hashes are stable across engines.
    Returns (id_col, cosine) ordered by (cosine desc, id).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine(F.col(vec_col), q)
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    return (
        embeddings.select(F.col(id_col), sim.alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def knn_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Top-k neighbors for every query row (queries broadcast).

    The query side must be small (it is broadcast to every executor); the
    corpus side streams. Self-matches (same id) are excluded.
    Returns (query_id, vec_id, cosine, rank).
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    )
    sim = cosine(F.col(vec_col), F.col("_qvec"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(F.col(query_id_col), F.col(id_col), sim.alias("cosine"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id (bigint) from hyperplane projections."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket.bitwiseOR(
            F.when(proj >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def knn_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    round_digits: int | None = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-LSH
    bucket, then exact cosine ranking within the bucket.

    The corpus is bucketed once (map-only); queries join on bucket id —
    at scale this replaces the full cross join with an equi-join whose key
    cardinality is 2^n_planes. Recall is tunable via n_planes (fewer planes
    = bigger buckets = higher recall, more compute).
    Returns (query_id, vec_id, cosine, rank).
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    corpus = embeddings.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
    ).withColumn("_bucket", lsh_bucket(F.col("_qvec"), planes))
    sim = cosine(F.col(vec_col), F.col("_qvec"))
    if round_digits is not None:
        sim = F.round(sim, round_digits)
    scored = (
        corpus.join(F.broadcast(q), "_bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(F.col(query_id_col), F.col(id_col), sim.alias("cosine"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
