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


def hot_entities(
    df: DataFrame,
    entity_col: str,
    threshold_rows: int,
) -> DataFrame:
    """Entities whose row count exceeds ``threshold_rows`` — the
    ingest-time audit feeding :func:`cap_hot_entities` (and the policy
    decision behind it). One map-side-combined groupBy; output is tiny
    by construction (only over-threshold keys survive).
    Returns (entity_col, n_rows) ordered by n_rows desc.
    """
    return (
        df.groupBy(entity_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .filter(F.col("n_rows") > threshold_rows)
        .orderBy(F.desc("n_rows"), entity_col)
    )


def cap_hot_entities(
    df: DataFrame,
    entity_col: str,
    max_rows: int,
    mode: str = "drop",
) -> DataFrame:
    """Ingest-side hot-entity policy for order-dependent downstream
    operators (r8 verdict #2): an entity with more than ``max_rows``
    rows (bot account, system user) would serialize onto one task in
    any per-entity ORDERED window — the skew class neither AQE (joins
    only) nor salting (breaks order semantics) can fix downstream, so
    the standard pipeline answer is an upstream cap at ingest.

    ``mode``:

    - ``"drop"``: remove over-cap entities ENTIRELY (bot/system-account
      policy — their sessions are meaningless anyway). Implemented as
      one aggregate to find the hot keys (tiny by construction) + a
      broadcast anti-join, so the big side never shuffles.
    - ``"sample"``: keep over-cap entities but thin them to ~``max_rows``
      rows via a DETERMINISTIC hash filter on the whole row
      (xxhash64 — reruns and stage retries keep identical rows). A
      "first N by time" cap would itself order-scan the hot entity on
      one core, recreating the straggler at ingest; the hash sample is
      map-only and order-free. Under-cap entities pass through intact.

    For keeping hot entities EXACT through sessionization instead, use
    :func:`market_data_pipeline_spark.operators.events.sessionize_sharded`.
    Returns df's schema unchanged.
    """
    if mode not in ("drop", "sample"):
        raise ValueError("mode must be 'drop' or 'sample'")
    hot = hot_entities(df, entity_col, max_rows)
    if mode == "drop":
        return df.join(
            F.broadcast(hot.select(entity_col)), [entity_col], "left_anti"
        )
    # sample: per-entity keep-fraction = max_rows / n_rows, applied as a
    # uniform threshold on a 64-bit row hash (NULL hash inputs fold to a
    # constant; ties across identical rows keep/drop together, which is
    # the right dedup-friendly behavior)
    frac = (F.lit(max_rows).cast("double") / F.col("n_rows")).alias("_keep_frac")
    hot_frac = hot.select(entity_col, frac)
    joined = df.join(F.broadcast(hot_frac), [entity_col], "left")
    h = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(1_000_000))
    return joined.filter(
        F.col("_keep_frac").isNull()
        | (h < F.col("_keep_frac") * 1_000_000)
    ).drop("_keep_frac")


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
