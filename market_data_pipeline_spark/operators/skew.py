"""Skew-handling join utilities (SURVEY §4 / 100 TB discipline).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py) handles most skew at runtime. These helpers cover
the cases AQE can't:

- ``salted_join``: a hot-key equi-join where the *small* side is too big
  to broadcast but small enough to replicate R times. AQE splits skewed
  partitions of shuffle joins, but when a single key's rows exceed one
  task's memory the split still leaves one task per key-half; salting
  spreads ONE key across R tasks deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join with the hot side salted across ``salt_buckets`` tasks.

    The big (skewed) side gets a deterministic salt —
    ``xxhash64(whole row) % R`` — so reruns shuffle identically (rand()
    salts make stage retries non-reproducible); the small side is
    replicated R times via a ``sequence`` explode. The join key becomes
    (on..., _salt): a key holding 1B rows now lands on R tasks instead
    of one.

    Cost model: R× duplication of the small side's shuffle volume buys
    R-way parallelism on the hottest key — choose R ≈ (hottest key rows) /
    (rows a task comfortably holds). Only for non-broadcastable small
    sides; broadcast beats salting whenever it fits.

    Supported ``how``: inner / left (the salted side must be the
    preserved side for outer joins).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (big side preserved)")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets)
    ).cast("int")
    big_s = big.withColumn("_salt", salt)
    small_s = (
        small.withColumn("_salt_arr", F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        .withColumn("_salt", F.explode("_salt_arr"))
        .drop("_salt_arr")
    )
    return big_s.join(small_s, [*on, "_salt"], how).drop("_salt")


def salted_group_agg(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: list[str] | None = None,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof grouped count/sum: two-phase aggregation through a
    deterministic salt — groupBy(key..., salt) partials, then
    groupBy(key...) finals — value-identical to the plain groupBy.

    Spark's hash aggregate already map-side-combines, which absorbs
    most group skew; what it can NOT absorb is a hot key whose partials
    still concentrate on one reduce task when the aggregation carries
    wide state (collect_list/set, exact distinct structures) or when
    the partial-combine is defeated by high upstream parallelism. The
    salt spreads ONE key's reduce work across ``salt_buckets`` tasks;
    the second shuffle is |keys| x buckets rows — trivially small.
    The salt is ``xxhash64(whole row) % buckets`` (deterministic under
    stage retries, unlike rand()).

    SUM exactness: each sum_col is summed as DECIMAL(38,6) in BOTH
    phases, so the two-phase result is bit-identical to the one-phase
    (and to any engine's) decimal sum regardless of row order; callers
    cast back as needed.
    Returns (key_cols..., n_rows, sum_<col>...).
    """
    sum_cols = sum_cols or []
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)
    ).cast("int")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_pn"),
            *[
                F.sum(F.col(c).cast("decimal(38,6)")).alias(f"_ps_{c}")
                for c in sum_cols
            ],
        )
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_pn").cast("long").alias("n_rows"),
        *[
            F.sum(F.col(f"_ps_{c}")).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
