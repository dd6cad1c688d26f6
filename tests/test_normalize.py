"""Unit tests for the normalization column functions (SURVEY §2.8),
mirroring the reference's densest test surface
(reference: tests/test_sync_delisted_stocks.py:139-185,
tests/test_krx_new_listing_crawler.py:158-174)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from market_data_pipeline_spark.functions import normalize as N


def _one_col(spark, values, fn):
    df = spark.createDataFrame([(v,) for v in values], ["c"])
    return [r[0] for r in df.select(fn(F.col("c")).alias("o")).collect()]


def test_strip_non_digits(spark):
    assert _one_col(spark, ["A123456", "654321B", "12-34"], N.strip_non_digits) == [
        "123456",
        "654321",
        "1234",
    ]


def test_parse_korean_number(spark):
    # reference: '500원' -> 500.0, '10,000원' -> 10000.0, junk -> null
    out = _one_col(spark, ["500원", "10,000원", "abc", ""], N.parse_korean_number)
    assert out == [500.0, 10000.0, None, None]


def test_clean_symbol_and_length(spark):
    out = _one_col(spark, ["A123456", "12345", "1234567"], N.clean_symbol)
    assert out == ["123456", "12345", "123456"]


def test_multiformat_date_parse(spark):
    # reference formats: '2023.12.31', '2023-11-30', '20231025'; junk -> null
    out = _one_col(
        spark, ["2023.12.31", "2023-11-30", "20231025", "2023", None], N.parse_multiformat_date
    )
    assert out == [
        datetime.date(2023, 12, 31),
        datetime.date(2023, 11, 30),
        datetime.date(2023, 10, 25),
        None,
        None,
    ]


def test_empty_to_null(spark):
    assert _one_col(spark, ["", "x"], N.empty_to_null) == [None, "x"]


def test_normalize_delisted_chain(spark):
    rows = [
        ("테스트회사", "A123456", "2023.12.31", "사유", "", "1", "KOSPI"),
        ("Too Short", "12345", "20231025", "r", "", "2", "KOSDAQ"),  # dropped: 5 digits
        ("Fine Co", "654321", "2023-11-30", "r", "", "3", "KONEX"),
    ]
    df = spark.createDataFrame(
        rows,
        ["company_name", "company_code", "delisting_date", "delisting_reason", "remarks", "sequence", "market"],
    )
    out = N.normalize_delisted(df).orderBy("company_code").collect()
    assert [r.company_code for r in out] == ["123456", "654321"]
    assert out[0].delisting_date_parsed == datetime.date(2023, 12, 31)
    assert out[0].remarks is None  # empty -> null
    assert out[0].company_name == "테스트회사"  # UTF-8 Korean preserved


def test_month_bucket(spark):
    df = spark.createDataFrame([(datetime.date(2023, 7, 15),)], ["d"])
    assert df.select(N.month_bucket(F.col("d")).alias("m")).first().m == "202307"
