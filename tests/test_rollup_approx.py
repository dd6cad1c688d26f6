"""Grouping-set and approximate-aggregate behavior: rollup/cube level
structure, sketch-vs-exact error bounds, ntile boundaries."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sales(spark):
    rows = [
        ("M1", 1995, 10), ("M1", 1995, 5), ("M1", 1996, 7), ("M2", 1995, 3),
    ]
    return spark.createDataFrame(rows, "market string, yr int, v long")


def test_rollup_levels(sales):
    out = {
        (r.market, r.yr): r.total
        for r in sales.rollup("market", "yr").agg(F.sum("v").alias("total")).collect()
    }
    assert out[("M1", 1995)] == 15
    assert out[("M1", None)] == 22      # per-market subtotal
    assert out[(None, None)] == 25      # grand total
    assert ("M2", None) in out and (None, 1995) not in out  # rollup, not cube


def test_cube_adds_cross_level(sales):
    out = {
        (r.market, r.yr): r.total
        for r in sales.cube("market", "yr").agg(F.sum("v").alias("total")).collect()
    }
    assert out[(None, 1995)] == 18      # the level rollup lacks
    assert out[(None, None)] == 25


def test_approx_percentile_within_bound(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("percentile_approx(l_extendedprice, 0.5, 10000)").alias("apx"),
    ).collect()[0]
    assert row.apx == pytest.approx(row.exact, rel=0.01)


def test_approx_count_distinct_within_bound(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("apx"),
    ).collect()[0]
    assert abs(row.apx - row.exact) / row.exact < 0.05


def test_ntile_boundaries(spark):
    df = spark.range(10).select(F.col("id"))
    out = df.select(
        "id", F.ntile(4).over(Window.orderBy("id")).alias("q")
    ).collect()
    got = [r.q for r in sorted(out, key=lambda r: r.id)]
    # 10 rows into 4 tiles -> sizes 3,3,2,2 (SQL standard)
    assert got == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]
