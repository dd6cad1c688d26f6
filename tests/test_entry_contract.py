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


def test_recording_order_is_rolling_vintage():
    """r8 verdict #1: the driver records a ~50-row prefix of queries()
    order, so the order must be (never-green oracled first, then greens
    stalest-vintage first, rows-only dead last) — computed from the
    CORRECTNESS trail, not hand-maintained sets."""
    qs, oras = E.queries(), E.oracle_sql()
    vint = E._newest_green_round()
    names = list(qs)
    oracled = [n for n in names if n in oras]
    rows_only = [n for n in names if n not in oras]
    assert names == oracled + rows_only
    nevers = [n for n in oracled if vint.get(n, 0) == 0]
    greens = [n for n in oracled if vint.get(n, 0) > 0]
    assert oracled[: len(nevers)] == nevers
    vs = [vint[n] for n in greens]
    assert vs == sorted(vs)


def test_every_query_builds_plan(spark, sf_dir):
    """Building the DataFrame (analysis phase) must succeed for every
    query; execution is covered by scripts/check_oracle.py and bench."""
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
