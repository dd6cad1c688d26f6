"""Smoke tests for the driver contract: entry() runs, every queries()
entry returns a DataFrame at sf0.001, and every oracle key has a query."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402


def test_entry_runs(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_oracle_keys_subset_of_queries():
    qs, oras = E.queries(), E.oracle_sql()
    assert set(oras) <= set(qs)
    assert len(qs) >= 30


def test_every_query_builds_plan(spark, sf_dir):
    """Building the DataFrame (analysis phase) must succeed for every
    query; execution is covered by scripts/check_oracle.py and bench."""
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
