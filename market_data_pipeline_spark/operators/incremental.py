"""Incremental aggregate maintenance: partial aggregates that merge.

At 100 TB you do not recompute the daily market summary over the whole
fact table every night — you aggregate the new partition into the same
partial-aggregate shape and MERGE it with the stored rollup. That only
works if every measure is algebraic (sum, count, min, max — and avg as
sum/count, never stored as avg): the merge of partials must equal the
direct aggregate, which is exactly what the oracle-checked ivm1 query
asserts. This mirrors what Spark itself does map-side (partial_sum ->
final merge); here the same discipline is applied ACROSS jobs/days
instead of across tasks.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The mergeable summary shape: keyed partial aggregates with only
# algebraic measures. `avg` is intentionally absent — it is derived at
# read time as sum/count.
_MEASURES = ("n_rows", "sum_close", "sum_volume", "min_close", "max_close")


def daily_summary_partial(price: DataFrame) -> DataFrame:
    """Partial (mergeable) per-day market summary over any slice of the
    price fact: counts, decimal-exact sums, min/max. Safe to compute per
    ingest batch / per partition and store."""
    return price.groupBy("trade_date").agg(
        F.count("close_price").alias("n_rows"),
        F.sum(F.col("close_price").cast("decimal(18,2)")).alias("sum_close"),
        F.sum(F.col("volume").cast("decimal(18,2)")).alias("sum_volume"),
        F.min("close_price").alias("min_close"),
        F.max("close_price").alias("max_close"),
    )


def merge_partials(*partials: DataFrame) -> DataFrame:
    """Merge any number of partial summaries into one: union + re-aggregate
    with the measure-appropriate combiner (sums add, counts add, min/max
    fold). Because every measure is algebraic, merge(partial(A),
    partial(B)) == partial(A ∪ B) exactly — including the decimal sums,
    which are order-insensitive."""
    u = reduce(lambda a, b: a.unionByName(b), partials)
    return u.groupBy("trade_date").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_close").alias("sum_close"),
        F.sum("sum_volume").alias("sum_volume"),
        F.min("min_close").alias("min_close"),
        F.max("max_close").alias("max_close"),
    )


def finalize_summary(partial: DataFrame) -> DataFrame:
    """Read-time projection of the stored partials into the user-facing
    summary (derives avg from sum/count; casts decimals out)."""
    return partial.select(
        "trade_date",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("sum_close").cast("double") / F.col("n_rows")).alias("avg_close"),
        F.col("sum_volume").cast("long").alias("total_volume"),
        "min_close",
        "max_close",
    )


def collapse_runs(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Gaps-and-islands run collapse (the SCD-Type-2 history builder):
    consecutive rows per key with the SAME ``value_col`` — in
    ``order_cols`` order — collapse into one validity run with its
    first/last order values and row count.

    The classic two-row_number difference: ``rn`` over (key) minus
    ``rn`` over (key, value) is constant within a run and distinct
    across runs of the same value. Both windows and the closing
    aggregate partition on the key, so the whole operator is ONE
    shuffle; order_cols must totally order each key's rows or runs are
    nondeterministic (pass a tiebreak column).
    Returns (key, value, run_start, run_end, n_rows) with run_start/
    run_end = first/last order_cols[0] value of the run.
    """
    from pyspark.sql import Window

    ord_exprs = [F.col(c) for c in order_cols]
    w_all = Window.partitionBy(key_col).orderBy(*ord_exprs)
    w_val = Window.partitionBy(key_col, value_col).orderBy(*ord_exprs)
    staged = df.withColumn(
        "_island",
        F.row_number().over(w_all) - F.row_number().over(w_val),
    )
    return (
        staged.groupBy(key_col, value_col, "_island")
        .agg(
            F.min(order_cols[0]).alias("run_start"),
            F.max(order_cols[0]).alias("run_end"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .drop("_island")
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    date_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Materialize an SCD-Type-2 dimension from an event stream: one
    validity interval per (key, value run) with ``valid_from`` /
    ``valid_to`` / ``is_current`` — the warehouse shape downstream
    point-in-time joins consume (the reference's master table keeps only
    is_active/delisting_date; this is the full history generalization).

    Stage 1 collapses the stream to ONE value per (key, date) —
    ``max_by(value, tiebreak)``, the latest writer wins deterministically
    — so run start dates are strictly increasing per key and the SCD
    intervals partition the timeline (without this, same-day value
    flapping makes interval bounds order-dependent). Stage 2 is
    :func:`collapse_runs`; stage 3 closes each interval at the NEXT
    run's start minus one day (LEAD over the key partition; NULL = open
    interval, flagged ``is_current``).

    Every window and aggregate partitions on the key: one shuffle.
    Returns (key_col, value_col, valid_from, valid_to, is_current,
    n_days).
    """
    from pyspark.sql import Window

    daily = df.groupBy(F.col(key_col), F.col(date_col).alias("_d")).agg(
        F.max_by(value_col, F.col(tiebreak_col)).alias(value_col)
    )
    runs = collapse_runs(daily, key_col, ["_d"], value_col)
    w = Window.partitionBy(key_col).orderBy("run_start")
    nxt = F.lead("run_start").over(w)
    return runs.select(
        F.col(key_col),
        F.col(value_col),
        F.col("run_start").alias("valid_from"),
        F.date_sub(nxt, 1).alias("valid_to"),
        nxt.isNull().alias("is_current"),
        F.col("n_rows").alias("n_days"),
    )
