"""File-format sources/sinks: lossless round-trips, corrupt-record
quarantine, schema-as-contract behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from market_data_pipeline_spark.sources import files as FS

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, "c,quoted", -2.0)], SCHEMA
    )


def _sorted(df):
    return sorted(map(tuple, df.collect()))


def test_jsonl_roundtrip(spark, frame, tmp_path):
    p = str(tmp_path / "j")
    FS.write_jsonl(frame, p)
    clean, quarantine = FS.read_jsonl(spark, p, SCHEMA)
    assert _sorted(clean) == _sorted(frame)
    assert quarantine.count() == 0


def test_jsonl_quarantines_bad_lines(spark, tmp_path):
    p = tmp_path / "feed"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"id": 1, "name": "ok", "score": 2.0}\n'
        "this is not json\n"
        '{"id": "NaN-ish", "name": 3}\n'   # schema violation -> corrupt
        '{"id": 2, "name": "also ok", "score": null}\n'
    )
    clean, quarantine = FS.read_jsonl(spark, str(p), SCHEMA)
    assert sorted(r.id for r in clean.collect()) == [1, 2]
    bad = [r[FS.CORRUPT_COL] for r in quarantine.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)


def test_csv_roundtrip_with_quoting(spark, frame, tmp_path):
    p = str(tmp_path / "c")
    FS.write_csv(frame, p)
    clean, quarantine = FS.read_csv(spark, p, SCHEMA)
    assert _sorted(clean) == _sorted(frame)   # incl. the embedded comma
    assert quarantine.count() == 0


def test_csv_quarantines_bad_rows(spark, tmp_path):
    p = tmp_path / "drop"
    p.mkdir()
    (p / "x.csv").write_text("id,name,score\n1,ok,2.0\nnot_a_number,bad,zz\n")
    clean, quarantine = FS.read_csv(spark, str(p), SCHEMA)
    assert [r.id for r in clean.collect()] == [1]
    assert quarantine.count() == 1


def test_orc_roundtrip(spark, frame, tmp_path):
    p = str(tmp_path / "o")
    FS.write_orc(frame, p)
    assert _sorted(FS.read_orc(spark, p)) == _sorted(frame)
