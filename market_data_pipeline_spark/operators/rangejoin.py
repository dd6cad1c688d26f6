"""Bucketed numeric range join (SURVEY §2.3 joins, scale escalation).

A fact row matches every dim interval with ``lo <= value < hi`` (price
bands, rating tiers, weight classes). The naive formulation is a
non-equi theta join, which Spark plans as a (Broadcast)NestedLoopJoin —
O(|fact| x |dim|) comparisons, and with a non-broadcastable dim a
single-task cartesian. This module is the numeric twin of the
time-interval trick in ``operators.events.interval_join``: quantize the
value axis into fixed-width buckets, explode each dim interval into the
buckets it covers, map each fact row to its single bucket, hash-join on
the bucket id, and apply the exact range predicate to the in-bucket
candidates.

Cost model: |fact| + sum(interval width / bucket width) shuffled rows
and a plain hash join — no nested loop anywhere. Pick ``bucket_width``
near the typical interval width so each interval explodes to O(1)
buckets. A fact row lives in exactly one bucket, so each qualifying
(fact, interval) pair appears exactly once — no dedup pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    fact: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 1.0,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to dim intervals with ``lo <= value < hi`` via
    bucket quantization (half-open, the standard band convention — bands
    that tile a range never double-match a boundary value).

    ``how='inner'`` drops unmatched fact rows; ``'left'`` keeps them with
    NULL dim columns (implemented as the inner bucket join UNIONed with
    the anti-joined remainder, so the nested-loop shape never appears
    even in the outer case).
    """
    w = float(bucket_width)
    fb = fact.withColumn("_bk", F.floor(F.col(value_col) / w))
    # hi is exclusive: a hi exactly on a bucket edge does not reach into
    # the next bucket. Computed exactly (floor(hi/w) minus one iff hi is
    # bucket-aligned) rather than via a floor(hi - epsilon) nudge, which
    # silently dropped the whole top bucket for any unaligned hi lying
    # within epsilon above a boundary. Inverted/empty intervals
    # (hi <= lo) are filtered before exploding — they can never satisfy
    # the half-open predicate, and a descending sequence() would explode
    # one bad dim row into (lo-hi)/w spurious bucket rows.
    first_bk = F.floor(F.col(lo_col) / w)
    last_bk = F.floor(F.col(hi_col) / w) - F.when(
        F.col(hi_col) % w == 0, F.lit(1)
    ).otherwise(F.lit(0))
    db = dim.filter(F.col(hi_col) > F.col(lo_col)).withColumn(
        "_bk", F.explode(F.sequence(first_bk, F.greatest(last_bk, first_bk)))
    )
    on = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    inner = fb.join(db, "_bk").filter(on).drop("_bk")
    if how == "inner":
        return inner
    if how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    matched_keys = inner.select(*fact.columns)
    unmatched = fb.drop("_bk").join(matched_keys, fact.columns, "left_anti")
    for c in dim.columns:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(dim.dtypes)[c])
        )
    return inner.unionByName(unmatched)
