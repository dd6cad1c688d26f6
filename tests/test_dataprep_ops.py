"""Round-3 additions: decontamination, SemDeDup-style semantic dedup,
Gopher repetition stats, deterministic shuffle-sharding."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import dedup as DD
from market_data_pipeline_spark.operators import similarity as SIM
from market_data_pipeline_spark.operators import text as TX


# --- decontaminate ----------------------------------------------------------


def test_decontaminate_flags_overlap(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words about spark plans here"),
            # shares exactly one 3-gram ("quick brown fox") -> below min_overlap
            (3, "a quick brown fox appears in private text"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over cliffs")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in DD.decontaminate(corpus, bench, n=3, min_overlap=2).collect()
    }
    assert set(out) == {1, 2, 3}
    # doc 1 shares "quick brown fox" + "brown fox jumps" + "fox jumps over"
    assert out[1]["n_overlap"] == 3 and out[1]["contaminated"] is True
    assert out[2]["n_overlap"] == 0 and out[2]["contaminated"] is False
    assert out[3]["n_overlap"] == 1 and out[3]["contaminated"] is False
    assert 0 < out[1]["overlap_frac"] <= 1.0


def test_decontaminate_counts_distinct_shingles(spark):
    # repeated benchmark phrase in one doc counts once (shingles are distinct)
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma and alpha beta gamma")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "alpha beta gamma")], "doc_id long, text string")
    row = DD.decontaminate(corpus, bench, n=3, min_overlap=1).collect()[0]
    assert row["n_overlap"] == 1 and row["contaminated"] is True


# --- semantic_dedup ---------------------------------------------------------


def test_semantic_dedup_keeps_lowest_id(spark):
    # two tight groups + one singleton; centroids = first 2 vectors
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (5, [0.99, 0.01, 0.0]),   # near-dup of 0
        (7, [0.98, 0.02, 0.0]),   # near-dup of 0 and 5
        (9, [0.0, 0.97, 0.1]),    # near-dup of 1
        (11, [0.0, 0.0, 1.0]),    # orthogonal: assigned somewhere, kept
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r.asDict()
        for r in SIM.semantic_dedup(emb, threshold=0.9, n_clusters=2).collect()
    }
    assert out[0]["keep"] is True and out[0]["dup_of"] is None
    assert out[5]["keep"] is False and out[5]["dup_of"] == 0
    assert out[7]["keep"] is False and out[7]["dup_of"] == 0  # min smaller-id dup
    assert out[9]["keep"] is False and out[9]["dup_of"] == 1
    assert out[11]["keep"] is True
    # survivors: exactly one per near-dup group
    assert sorted(v["vec_id"] for v in out.values() if v["keep"]) == [0, 1, 11]


def test_semantic_dedup_threshold_boundary(spark):
    # cosine exactly at threshold counts as a dup (>=)
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["keep"] for r in SIM.semantic_dedup(
        emb, threshold=1.0, n_clusters=1).collect()}
    assert out == {0: True, 1: False, 2: True}


# --- repetition_stats -------------------------------------------------------


def test_repetition_stats_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [(1, "hello"), (2, "go go go go")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in TX.repetition_stats(docs).collect()}
    # single token: no bigrams, fractions NULL except top_token_frac
    assert out[1]["n_tokens"] == 1 and out[1]["n_2grams"] == 0
    assert out[1]["dup_2gram_frac"] is None and out[1]["top_2gram_frac"] is None
    assert out[1]["top_token_frac"] == 1.0
    # "go go go go": 3 bigrams all "go go" -> dup frac 2/3, top frac 1
    assert out[2]["n_2grams"] == 3
    assert abs(out[2]["dup_2gram_frac"] - 2 / 3) < 1e-12
    assert out[2]["top_2gram_frac"] == 1.0 and out[2]["top_token_frac"] == 1.0


def test_repetition_stats_mixed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    row = TX.repetition_stats(docs).collect()[0]
    # bigrams: "a b","b a","a b","b c" -> 4 total, 3 distinct
    assert row["n_2grams"] == 4
    assert abs(row["dup_2gram_frac"] - 0.25) < 1e-12
    assert abs(row["top_2gram_frac"] - 0.5) < 1e-12
    assert abs(row["top_token_frac"] - 0.4) < 1e-12


# --- shuffle_shards ---------------------------------------------------------


def test_shuffle_shards_balanced_permutation(spark):
    docs = spark.range(0, 103).withColumnRenamed("id", "doc_id")
    out = TX.shuffle_shards(docs, key_col="doc_id", n_shards=8).collect()
    assert len(out) == 103
    assert {r["doc_id"] for r in out} == set(range(103))
    sizes = Counter(r["shard"] for r in out)
    assert set(sizes) == set(range(1, 9))
    # NTILE balance: sizes differ by at most 1, big buckets first
    assert sorted(sizes.values(), reverse=True) == [sizes[s] for s in range(1, 9)]
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # pos is a contiguous 1..size sequence inside each shard
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, sizes[s] + 1))


def test_shuffle_shards_deterministic_and_seeded(spark):
    docs = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    a = sorted(map(tuple, TX.shuffle_shards(docs, "doc_id", 4).collect()))
    b = sorted(map(tuple, TX.shuffle_shards(docs, "doc_id", 4).collect()))
    assert a == b  # rerun-stable
    c = sorted(map(tuple, TX.shuffle_shards(docs, "doc_id", 4, seed="99").collect()))
    assert a != c  # seed actually permutes


# --- weighted_sample --------------------------------------------------------


def test_weighted_sample_bounds_and_monotonic(spark):
    docs = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    assert TX.weighted_sample(docs, F.lit(0.0)).count() == 0
    assert TX.weighted_sample(docs, F.lit(1.0)).count() == 200
    lo = {r["doc_id"] for r in TX.weighted_sample(docs, F.lit(0.3)).collect()}
    hi = {r["doc_id"] for r in TX.weighted_sample(docs, F.lit(0.7)).collect()}
    # same per-key uniform: raising the probability only ADDS rows
    assert lo <= hi
    assert 30 <= len(lo) <= 90 and 100 <= len(hi) <= 180


# --- domain_quota_sample ----------------------------------------------------


def test_domain_quota_respects_budget(spark):
    rows = [(i, "a" if i < 10 else "b", 30) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = TX.domain_quota_sample(df, budget=100, group_col="source",
                                 size_col="n_chars", key_col="doc_id").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # 30-char docs against a 100 budget: exactly 3 kept per domain
    for src in ("a", "b"):
        kept = by_src[src]
        assert len(kept) == 3
        assert max(r["cum_size"] for r in kept) <= 100
    big = TX.domain_quota_sample(df, budget=10_000, group_col="source",
                                 size_col="n_chars", key_col="doc_id")
    assert big.count() == 20  # budget above total keeps everything


# --- zscore_outliers --------------------------------------------------------


def test_zscore_flags_spike_and_skips_flat(spark):
    import datetime as dt
    from market_data_pipeline_spark.operators import timeseries as TS

    base = dt.date(2020, 1, 1)
    rows = []
    for i in range(30):
        # flat-ish series with one violent spike at i == 15
        px = 100.0 + (i % 3) + (400.0 if i == 15 else 0.0)
        rows.append(("SPIKY", base + dt.timedelta(days=i), px))
        rows.append(("FLAT", base + dt.timedelta(days=i), 50.0))
    df = spark.createDataFrame(rows, "symbol string, trade_date date, close_price double")
    out = TS.zscore_outliers(df, z_threshold=2.5).collect()
    syms = {r["symbol"] for r in out}
    assert "FLAT" not in syms            # zero-variance series excluded
    spike_days = [r["trade_date"] for r in out if r["symbol"] == "SPIKY"]
    assert base + dt.timedelta(days=15) in spike_days  # the jump is flagged
    assert all(abs(r["z"]) >= 2.5 for r in out)


# --- retention_cohorts ------------------------------------------------------


def test_retention_cohorts_offsets(spark):
    import datetime as dt
    from market_data_pipeline_spark.operators import events as EV

    def t(d):  # Monday-based weeks: 2024-01-01 is a Monday
        return dt.datetime(2024, 1, d, 12, 0, 0)

    rows = [
        (1, t(1)), (1, t(2)),   # u1 week0 twice
        (1, t(9)),              # u1 week1
        (2, t(3)),              # u2 week0 only
        (3, t(10)), (3, t(22)), # u3 cohort week1, active offset 0 and 2
    ]
    ev_df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(str(r["cohort_week"]), r["week_offset"]): r["n_users"]
           for r in EV.retention_cohorts(ev_df).collect()}
    assert out[("2024-01-01", 0)] == 2   # u1, u2
    assert out[("2024-01-01", 1)] == 1   # u1 returns
    assert out[("2024-01-08", 0)] == 1   # u3's own cohort
    assert out[("2024-01-08", 2)] == 1   # u3 two weeks later
    assert len(out) == 4


# --- incremental_dedup ------------------------------------------------------


def test_incremental_dedup_drops_seen_content(spark):
    seen = spark.createDataFrame(
        [(1, "The quick brown fox"), (2, "other document")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "the  QUICK brown   fox"),  # normalized dup of doc 1
            (11, "a genuinely new document"),
        ],
        "doc_id long, text string",
    )
    out = DD.incremental_dedup(new, seen).collect()
    assert [r["doc_id"] for r in out] == [11]
    assert set(out[0].asDict()) == {"doc_id", "text"}  # original cols intact


def test_incremental_dedup_custom_fingerprint(spark):
    from pyspark.sql import functions as SF

    seen = spark.createDataFrame([(1, "aaa bbb xyz")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(5, "aaa bbb DIFFERENT"), (6, "ccc ddd eee")], "doc_id long, text string"
    )
    two_tok = SF.md5(
        SF.array_join(
            SF.slice(SF.split(SF.lower(SF.trim(SF.col("text"))), r"[ \t\n\x0B\f\r]+"), 1, 2), " "
        ).cast("binary")
    )
    out = DD.incremental_dedup(new, seen, fingerprint_col=two_tok).collect()
    assert [r["doc_id"] for r in out] == [6]  # doc 5 shares the 2-token head


# --- interval_overlap_join --------------------------------------------------


def test_interval_overlap_join_emits_each_pair_once(spark):
    import datetime as dt

    from market_data_pipeline_spark.operators import events as EV

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    # A spans 3 hourly buckets and overlaps B in 2 of them -> still 1 row;
    # C is disjoint
    left = spark.createDataFrame(
        [("A", t(1, 0), t(3, 30))], "lid string, ls timestamp, le timestamp"
    )
    right = spark.createDataFrame(
        [("B", t(2, 15), t(5, 0)), ("C", t(6, 0), t(7, 0))],
        "rid string, rs timestamp, re timestamp",
    )
    out = EV.interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bucket="1 hour"
    ).collect()
    assert [(r["lid"], r["rid"]) for r in out] == [("A", "B")]

    # boundary touch (end == start) counts as overlap, like the SQL <=
    right2 = spark.createDataFrame(
        [("D", t(3, 30), t(4, 0))], "rid string, rs timestamp, re timestamp"
    )
    out2 = EV.interval_overlap_join(
        left, right2, "ls", "le", "rs", "re", bucket="1 hour"
    ).collect()
    assert [(r["lid"], r["rid"]) for r in out2] == [("A", "D")]
