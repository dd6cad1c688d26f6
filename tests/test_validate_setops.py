"""Tests for the validation chain (SURVEY §3.2) and set operations
(SURVEY §2.7)."""

from __future__ import annotations

import datetime as dt

import pytest

from market_data_pipeline_spark.operators import validate as V
from market_data_pipeline_spark.operators.setops import key_difference, union_relaxed

D = dt.date


def test_validate_delisted_chain(spark):
    rows = [
        ("123456", "Good Co", D(2020, 1, 1)),
        ("12345", "Short Code", D(2020, 1, 1)),      # bad symbol
        ("234567", "  ", D(2020, 1, 1)),             # blank name
        ("345678", "Old", D(1980, 1, 1)),            # date below range
        ("456789", "Dup", D(2021, 5, 5)),
        ("456789", "Dup", D(2021, 5, 5)),            # exact dup -> deduped
    ]
    df = spark.createDataFrame(rows, ["symbol", "name", "delisting_date"])
    valid, stats = V.validate_delisted(df)
    st = stats.first()
    assert st.input_count == 6
    assert st.valid_symbol_failed == 1
    assert st.valid_name_failed == 1
    assert st.valid_date_failed == 1
    assert st.valid_count == 3  # pre-dedup survivors
    assert valid.count() == 2   # post-dedup


def test_validate_missing_columns_raises(spark):
    df = spark.createDataFrame([("x",)], ["symbol"])
    with pytest.raises(ValueError, match="missing required columns"):
        V.validate_delisted(df)


def test_union_relaxed_widens_and_fills(spark):
    a = spark.createDataFrame([(1, "x")], ["id", "name"])          # id: long
    b = spark.createDataFrame([(2.5, "y", True)], ["id", "name", "flag"])  # id: double
    out = union_relaxed([a, b])
    assert dict(out.dtypes)["id"] == "double"  # widened
    rows = sorted(out.collect(), key=lambda r: r.id)
    assert rows[0].flag is None and rows[1].flag is True


def test_union_relaxed_conflicting_falls_to_string(spark):
    a = spark.createDataFrame([(1,)], ["v"])
    b = spark.createDataFrame([("x",)], ["v"])
    out = union_relaxed([a, b])
    assert dict(out.dtypes)["v"] == "string"
    assert {r.v for r in out.collect()} == {"1", "x"}


def test_key_difference(spark):
    existing = spark.createDataFrame([("a",), ("b",)], ["k"])
    incoming = spark.createDataFrame([("b",), ("c",), ("c",)], ["k"])
    assert [r.k for r in key_difference(existing, incoming, "k").collect()] == ["c"]
