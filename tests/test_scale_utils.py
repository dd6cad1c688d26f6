"""Scale utilities: salted skew joins and bucketed co-located joins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_pipeline_spark.operators.skew import salted_join
from market_data_pipeline_spark.storage.table import write_bucketed


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (k=0 has 2000 rows), several cold ones
    big = spark.range(2400).select(
        F.when(F.col("id") < 2000, 0).otherwise((F.col("id") % 7).cast("long")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim-{i}") for i in range(7)], ["k", "label"]
    )
    return big, small


def test_salted_join_matches_plain_join(skewed):
    big, small = skewed
    plain = big.join(small, ["k"]).select("k", "payload", "label")
    salted = salted_join(big, small, on=["k"], salt_buckets=4).select(
        "k", "payload", "label"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], ["k", "v"])
    small = spark.createDataFrame([(1, "dim")], ["k", "label"])
    out = {r.k: r.label for r in salted_join(big, small, ["k"], how="left").collect()}
    assert out == {1: "dim", 99: None}


def test_salted_join_spreads_hot_key(skewed):
    big, small = skewed
    salted = salted_join(big, small, on=["k"], salt_buckets=4)
    # deterministic salt: same row -> same salt on recompute
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    # the hot key's rows actually use multiple salt values
    salts = (
        big.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(4)).cast("int"),
        )
        .filter(F.col("k") == 0)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 1


def test_bucketed_join_has_no_shuffle(spark):
    facts = spark.range(1000).select(
        (F.col("id") % 50).alias("k"), (F.col("id") * 2).alias("x")
    )
    dims = spark.range(500).select(
        (F.col("id") % 50).alias("k"), (F.col("id") * 3).alias("y")
    )
    try:
        write_bucketed(facts, "t_bucketed_facts", ["k"], num_buckets=8, sort_cols=["k"])
        write_bucketed(dims, "t_bucketed_dims", ["k"], num_buckets=8, sort_cols=["k"])
        fa = spark.table("t_bucketed_facts")
        di = spark.table("t_bucketed_dims")
        # disable broadcast so the join would otherwise shuffle
        joined = fa.hint("merge").join(di, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        assert joined.count() == facts.join(dims, "k").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bucketed_facts")
        spark.sql("DROP TABLE IF EXISTS t_bucketed_dims")


def test_partition_pruning_on_trade_month(spark, tmp_path):
    """The MergeTree-layout emulation must actually prune: a trade_month
    predicate limits the scan to matching hive partitions."""
    import datetime as dt

    from market_data_pipeline_spark.storage.table import stock_price_table

    t = stock_price_table(spark, str(tmp_path / "price"))
    rows = [
        ("A", dt.date(2023, m, 15), 100.0 + m, dt.datetime(2023, m, 15))
        for m in range(1, 7)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, trade_date date, close_price double, update_dt timestamp"
    )
    t.overwrite(df)

    pruned = spark.read.parquet(t.path).filter(F.col("trade_month") == "202303")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(trade_month" in plan.replace("#", "").replace(
        "L", ""
    ) or "trade_month" in plan.split("PartitionFilters")[1].split("]")[0]
    # and the scan reads exactly one of six partitions' rows
    assert pruned.count() == 1


# --- hot-bucket cap (the 100 TB dedup robustness knob) ----------------------


def test_pairs_within_groups_hot_bucket_cap(spark):
    from market_data_pipeline_spark.operators.util import (
        bucket_overflow_stats,
        pairs_within_groups,
    )

    # adversarial viral bucket: 100 members would emit 4950 pairs in ONE
    # task; the cap must drop the whole bucket while the cold bucket's
    # pair still comes through
    rows = [("hot", i) for i in range(100)] + [("cold", 1000), ("cold", 1001)]
    df = spark.createDataFrame(rows, "bucket string, id long")

    capped = pairs_within_groups(df, ["bucket"], "id", max_group_size=10).collect()
    assert len(capped) == 1
    assert (capped[0]["a"]["id"], capped[0]["b"]["id"]) == (1000, 1001)

    # uncapped keeps the quadratic explosion (100*99/2 + 1)
    assert pairs_within_groups(df, ["bucket"], "id").count() == 4951

    # the audit reports exactly what the cap discarded
    stats = bucket_overflow_stats(df, ["bucket"], 10).collect()
    assert len(stats) == 1
    assert stats[0]["bucket"] == "hot" and stats[0]["group_size"] == 100


def test_ngram_jaccard_stop_shingle_cap(spark):
    from market_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs

    # every doc shares ONE viral shingle ("common words here"); all other
    # shingles are unique per doc
    docs = spark.createDataFrame(
        [(i, f"common words here tail{i} x{i} y{i}") for i in range(20)],
        "doc_id long, text string",
    )
    uncapped = ngram_jaccard_pairs(
        docs, group_col=None, n=3, threshold=0.01
    ).count()
    assert uncapped == 20 * 19 // 2  # viral bucket pairs everything

    capped = ngram_jaccard_pairs(
        docs, group_col=None, n=3, threshold=0.01, max_doc_freq=5
    ).count()
    assert capped == 0  # stop-shingle dropped, no other shared shingles


def test_minhash_lsh_bucket_cap_drops_viral_band(spark):
    from market_data_pipeline_spark.operators.dedup import minhash_lsh_pairs

    # 30 identical docs -> every band bucket has 30 members; a cap of 10
    # suppresses all candidate pairs, uncapped emits 30*29/2
    docs = spark.createDataFrame(
        [(i, "the same exact boilerplate text repeated everywhere") for i in range(30)],
        "doc_id long, text string",
    )
    assert minhash_lsh_pairs(docs, num_hashes=16, bands=4).count() == 435
    assert (
        minhash_lsh_pairs(docs, num_hashes=16, bands=4, max_bucket_size=10).count()
        == 0
    )


def _rowgroups_touched(path, col, lo, hi):
    """Count parquet row groups whose [min, max] stats intersect [lo, hi]
    — what a stats-pruning scan would actually read."""
    import glob

    import pyarrow.parquet as pq

    total = touched = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == col:
                    total += 1
                    st = c.statistics
                    if st is None or (st.min <= hi and st.max >= lo):
                        touched += 1
    return touched, total


def test_zorder_write_prunes_on_both_dimensions(spark, tmp_path):
    from market_data_pipeline_spark.storage.table import zorder_write

    # two independent uniform dimensions; a 1-D sort can only prune one
    df = (
        spark.range(0, 40000)
        .select(
            (F.xxhash64("id") % 1000).alias("x"),
            (F.xxhash64("id", F.lit(1)) % 1000).alias("y"),
        )
    )
    zpath = str(tmp_path / "zordered")
    xpath = str(tmp_path / "xsorted")
    zorder_write(df, zpath, ["x", "y"], bits=6, num_files=64)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )

    # point-ish range on each dimension: 5% of the value domain
    for col in ("x", "y"):
        zt, ztot = _rowgroups_touched(zpath, col, -500, -451)
        assert ztot > 0
        # z-clustering must prune MOST row groups on EITHER dimension
        assert zt / ztot < 0.5, f"{col}: z-order touched {zt}/{ztot}"
    xt_x, xtot = _rowgroups_touched(xpath, "x", -500, -451)
    xt_y, _ = _rowgroups_touched(xpath, "y", -500, -451)
    assert xt_x / xtot < 0.3          # 1-D sort prunes its own column...
    assert xt_y / xtot > 0.9          # ...and nothing on the other
    # and the whole point: z-order beats 1-D sort on the second dimension
    zt_y, ztot_y = _rowgroups_touched(zpath, "y", -500, -451)
    assert zt_y / ztot_y < xt_y / xtot


def test_zvalue_interleaves_bits(spark):
    from market_data_pipeline_spark.storage.table import zvalue

    df = spark.createDataFrame([(0.0, 0.0), (3.0, 0.0), (0.0, 3.0)], "x double, y double")
    # boundaries put 0..3 into buckets 0..3 (bits=2)
    b = {"x": [1.0, 2.0, 3.0], "y": [1.0, 2.0, 3.0]}
    out = [
        r["z"]
        for r in df.select(zvalue(["x", "y"], bits=2, boundaries=b).alias("z")).collect()
    ]
    # (x=0,y=0)->0; (x=3,y=0)-> bits of 3 on even positions = 0b0101 = 5;
    # (x=0,y=3)-> odd positions = 0b1010 = 10
    assert out == [0, 5, 10]
