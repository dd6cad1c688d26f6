"""Bloom-filter-pruned semi-join (SURVEY §2.3 J4's scale escalation).

The semi-join family (`backtest_universe`, `insert_if_absent`) filters a
fact by membership in a dim-side key set. Three regimes by dim size:

- tiny: ``isin`` literal list (predicate pushdown to the scan);
- broadcastable: broadcast left-semi hash join;
- too big to broadcast but far smaller than the fact: THIS module — a
  Bloom filter of the dim keys (bit-array, ~10 bits/key at 1% fp) is
  built with a distributed ``bit_or`` aggregation, shipped into the fact
  scan as a map-side filter, and the survivors (matches + ~1% false
  positives) go through an exact shuffle semi-join for the final answer.

At 100 TB the point is shuffle volume: the exact semi-join still runs,
but its probe side is the ~1% that passed the bloom instead of the whole
fact. Spark's own runtime row-group filters (AQE/DPP) cover some of this
automatically for equi-joins; the explicit operator covers the cases the
optimizer can't see (multi-stage pipelines, keys computed mid-flight) and
makes the memory/fp trade-off a declared parameter.

The bitmap aggregation never funnels keys anywhere: each executor ORs a
partial bitmap, the driver merge is ``num_bits/64`` longs regardless of
key count (1M bits = 16 KB of longs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k independent bit positions via seed-mixed xxhash64."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def build_bloom(
    dim: DataFrame, key_col: str, num_bits: int = 1 << 20, num_hashes: int = 5
) -> list[int]:
    """Aggregate the dim keys into a Bloom bitmap (list of uint64 words).

    Shape: explode each key into its k (word, bit) pairs, ``bit_or`` the
    masks per word (map-side combined), collect at most num_bits/64 rows.
    The collect is bounded by the BITMAP size, never the key count.
    """
    pos = F.explode(F.array(*_positions(F.col(key_col), num_bits, num_hashes)))
    words = (
        dim.select(pos.alias("_pos"))
        .select(
            (F.col("_pos") / 64).cast("int").alias("_word"),
            (F.col("_pos") % 64).cast("int").alias("_bit"),
        )
        # shiftleft's python binding takes only a literal shift; the SQL
        # form accepts a column
        .select("_word", F.expr("shiftleft(CAST(1 AS BIGINT), _bit)").alias("_mask"))
        .groupBy("_word")
        .agg(F.bit_or("_mask").alias("_bits"))
        .collect()
    )
    bitmap = [0] * ((num_bits + 63) // 64)
    for row in words:
        bitmap[row["_word"]] = row["_bits"]
    return bitmap


def bloom_might_contain(
    key: Column, bitmap: list[int], num_bits: int, num_hashes: int = 5
) -> Column:
    """Membership test against a literal bitmap — pure codegen expression
    (array literal + element_at + bit_get), evaluated at the scan.

    The literal is pinned to array<bigint>: lit() infers array<int> when
    every word happens to fit 32 bits (e.g. an empty dim's all-zero
    bitmap), and bit_get then rejects positions >= 32."""
    words = F.lit(bitmap).cast("array<bigint>")
    cond = F.lit(True)
    for pos in _positions(key, num_bits, num_hashes):
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        cond = cond & (F.bit_get(word, (pos % 64).cast("int")) == 1)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Exact left-semi join of fact against dim keys, bloom-pre-pruned.

    The bloom filter removes all-but-~fp of the non-matching fact rows
    BEFORE the shuffle; the closing semi-join removes the false
    positives, so the result is exactly ``fact SEMI JOIN dim`` (oracle:
    ``WHERE fact_key IN (SELECT dim_key ...)``).
    """
    bitmap = build_bloom(dim, dim_key, num_bits, num_hashes)
    pruned = fact.filter(
        bloom_might_contain(F.col(fact_key), bitmap, num_bits, num_hashes)
    )
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return pruned.join(keys, fact_key, "left_semi")
