"""Small shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, id_col: str | None = None) -> DataFrame:
    """Repartition a frame up to the cluster's default parallelism when its
    scan would otherwise under-parallelize downstream compute.

    Single-file parquet with one row group (the driver's testdata layout)
    scans as ONE input partition, so a map-only pipeline (shingling,
    signatures, feature extraction) runs on one core no matter how many
    executors exist. One cheap exchange of the raw rows unlocks the full
    cluster. At production scale inputs ship in many files/row groups and
    this is a no-op (the partition count check short-circuits).
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, target // 2):
        return df
    return df.repartition(target, id_col) if id_col else df.repartition(target)
