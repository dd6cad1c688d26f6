"""Declarative data-quality constraint checker (operators/quality.py)."""

from __future__ import annotations

import pytest

from market_data_pipeline_spark.operators import quality as DQ


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A", "ok"),
            (2, -5.0, "A", None),   # range violation, null name
            (3, 20.0, "X", "ok"),   # set violation
            (3, 30.0, "A", "ok"),   # duplicate key
        ],
        "k long, v double, flag string, name string",
    )


def test_row_rules_one_report_row_each(spark, frame):
    rep = {
        r.constraint: r
        for r in DQ.check_constraints(
            frame,
            [
                DQ.in_range("v", 0.0, 100.0),
                DQ.in_set("flag", ["A", "B"]),
                DQ.not_null("name"),
            ],
            unique_keys=[["k"]],
        ).collect()
    }
    assert rep["v_in_range"].n_violations == 1
    assert rep["flag_in_set"].n_violations == 1
    assert rep["name_not_null"].n_violations == 1
    assert rep["unique(k)"].n_violations == 1
    assert all(r.n_rows == 4 for r in rep.values())
    assert rep["v_in_range"].pass_ratio == 0.75
    assert not rep["v_in_range"].passed


def test_all_passing(spark, frame):
    rep = DQ.check_constraints(frame, [DQ.not_null("k")]).collect()
    assert len(rep) == 1 and rep[0].passed and rep[0].pass_ratio == 1.0


def test_null_fails_range_and_matches(spark):
    df = spark.createDataFrame([(None,), ("abc",)], "s string")
    rep = {
        r.constraint: r.n_violations
        for r in DQ.check_constraints(
            df, [DQ.matches("s", r"^[a-z]+$")]
        ).collect()
    }
    assert rep["s_matches"] == 1  # null is a violation, 'abc' passes


def test_requires_some_constraint(spark, frame):
    with pytest.raises(ValueError):
        DQ.check_constraints(frame, [])


def test_profile_columns_long_form(spark):
    from market_data_pipeline_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, s string"
    )
    out = {r["column"]: r.asDict() for r in profile_columns(df, ["k", "s"]).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 2
    assert out["k"]["min_value"] == "1" and out["k"]["max_value"] == "2"
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] == "a" and out["s"]["max_value"] == "b"


def test_shared_scaffold_helpers(spark):
    """r10 registry-hygiene extraction: the shared explode/shingle/HHI
    scaffolds behave at their edges (NULL text, empty tokens, short
    docs) exactly as the inline forms they replaced."""
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.operators import text as TX
    from market_data_pipeline_spark.operators.analytics import fixed_point_hhi
    from market_data_pipeline_spark.operators.dedup import (
        distinct_ngrams,
        shingle_hash_docfreq,
    )

    docs = spark.createDataFrame(
        [(1, "en", "\tThe  quick the", ), (2, "en", None), (3, "de", "und")],
        "doc_id long, lang string, text string",
    )
    words = TX.exploded_words(docs, carry_cols=("doc_id", "lang")).collect()
    # NULL text vanishes; leading tab yields no empty token; lowercased
    assert sorted((r.doc_id, r.word) for r in words) == [
        (1, "quick"), (1, "the"), (1, "the"), (3, "und")]
    flags = [
        r["f"] for r in TX.exploded_words(docs, carry_cols=("lang",))
        .select(TX.own_language_stopword_flag().alias("f")).collect()
    ]
    assert sum(flags) == 3  # 'the' x2 (en), 'und' (de); 'quick' is not

    # distinct_ngrams: docs shorter than n produce nothing; grams distinct
    ng = distinct_ngrams(docs, "doc_id", n=3).collect()
    assert [(r.doc_id, r.g) for r in ng] == [(1, "the quick the")]
    sh, df_ = shingle_hash_docfreq(docs)
    assert df_.count() == sh.select("shingle").distinct().count()

    # fixed_point_hhi: a 60/40 split -> 0.52 exactly on the 1e-12 grid
    t = spark.createDataFrame(
        [("m", 6000), ("m", 4000)], "market string, cents long"
    )
    row = fixed_point_hhi(t, "market").first()
    assert row.n_symbols == 2 and abs(row.hhi - 0.52) < 1e-12
