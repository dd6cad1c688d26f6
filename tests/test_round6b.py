"""Round-7 bank batch 6 operator tests: event-type lift, retention
survival, Garman-Klass volatility, Roll spread, and the order-price
reconciliation audit — each pinned against a hand-computed or numpy
reference on tiny deterministic inputs."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import events as ev
from market_data_pipeline_spark.operators import timeseries as tseries


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_event_type_lift_hand_computed(spark):
    """4 users: u1,u2 do A+B, u3 only A, u4 only B.
    N=4, n_a=3, n_b=3, n_both=2 -> lift = 2*4/(3*3) = 0.888889."""
    t = dt.datetime(2024, 1, 1, 9)
    rows = [
        (1, 1, "A", t), (2, 1, "B", t), (3, 2, "A", t), (4, 2, "B", t),
        (5, 3, "A", t), (6, 4, "B", t),
        # duplicates must not inflate counts (distinct (user, type) first)
        (7, 1, "A", t), (8, 3, "A", t),
    ]
    out = ev.event_type_lift(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("A", "B")
    assert (r["n_a"], r["n_b"], r["n_both"]) == (3, 3, 2)
    assert r["lift"] == round(2 * 4 / 9, 6)


def test_event_type_lift_independence_is_one(spark):
    """A perfectly independent split: every user has A, half have B ->
    lift = (N/2)*N / (N * N/2) = 1.0 exactly."""
    t = dt.datetime(2024, 1, 1, 9)
    rows = []
    eid = 0
    for u in range(1, 9):
        eid += 1
        rows.append((eid, u, "A", t))
        if u <= 4:
            eid += 1
            rows.append((eid, u, "B", t))
    out = ev.event_type_lift(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["lift"] == 1.0


def test_retention_survival_reverse_cumulative(spark):
    """Lifetimes 0,0,2,5 -> survival curve (0: 4/4), (2: 2/4), (5: 1/4)."""
    def span(uid, days):
        base = dt.datetime(2024, 1, 1, 9)
        return [
            (uid * 10, uid, "x", base),
            (uid * 10 + 1, uid, "x", base + dt.timedelta(days=days)),
        ]

    rows = span(1, 0)[:1] + span(2, 0)[:1] + span(3, 2) + span(4, 5)
    out = {
        r["lifetime_days"]: r
        for r in ev.retention_survival(_events(spark, rows)).collect()
    }
    assert set(out) == {0, 2, 5}
    assert (out[0]["n_keys"], out[0]["surviving"], out[0]["survival_rate"]) == (2, 4, 1.0)
    assert (out[2]["n_keys"], out[2]["surviving"], out[2]["survival_rate"]) == (1, 2, 0.5)
    assert (out[5]["n_keys"], out[5]["surviving"], out[5]["survival_rate"]) == (1, 1, 0.25)


def _price_df(spark, closes, start=dt.date(2024, 1, 1)):
    """One symbol, consecutive weekdays-agnostic daily closes."""
    rows = [
        ("S", start + dt.timedelta(days=i), float(c)) for i, c in enumerate(closes)
    ]
    return spark.createDataFrame(rows, "symbol string, trade_date date, close_price double")


def test_garman_klass_single_bar_closed_form(spark):
    """Mon..Fri of one ISO week -> one bar; expected value computed with
    the same fixed-point rounding the operator documents."""
    closes = [100.0, 104.0, 98.0, 101.0, 103.0]  # 2024-01-01 is a Monday
    out = tseries.garman_klass_vol(_price_df(spark, closes)).collect()
    assert len(out) == 1
    o, c, h, l = 100.0, 103.0, 104.0, 98.0
    k = 0.3862943611198906
    term = 0.5 * math.log(h / l) ** 2 - k * math.log(c / o) ** 2
    expected = math.sqrt(max(0.0, round(term * 1e12) / 1e12))
    assert out[0]["n_bars"] == 1
    assert out[0]["gk_vol"] == pytest.approx(expected, abs=1e-12)


def test_garman_klass_negative_mean_floors_to_zero(spark):
    """A bar where the close-to-open swing dwarfs the range is
    impossible (|ln C/O| <= ln H/L), so force the floor with a
    DEGENERATE range: H == L (term = -k*ln(C/O)^2 < 0 ... but H=L means
    C=O too). Instead: two days, H/L tiny vs C/O makes term negative:
    closes 100, 100.0001 -> ln(H/L) ~ 1e-6, term ~ 0.5e-12 - k*1e-12 < 0."""
    closes = [100.0, 100.0001]
    out = tseries.garman_klass_vol(_price_df(spark, closes)).collect()
    assert len(out) == 1
    assert out[0]["gk_vol"] == 0.0


def test_roll_spread_vs_numpy(spark):
    """Deterministic bouncy returns -> spread must match
    2*sqrt(-cov_pop(ret_t, ret_{t-1})) rounded to 6 dp."""
    rng = np.random.RandomState(7)
    rets = (0.01 * rng.standard_normal(40) + 0.02 * np.tile([1, -1], 20)).round(6)
    rows = [
        ("S", dt.date(2024, 1, 1) + dt.timedelta(days=i), float(r))
        for i, r in enumerate(rets)
    ]
    df = spark.createDataFrame(rows, "symbol string, trade_date date, ret double")
    out = tseries.roll_spread(df).collect()
    assert len(out) == 1
    x, y = rets[1:], rets[:-1]
    cov = float(np.mean(x * y) - np.mean(x) * np.mean(y))
    expected = round(2 * math.sqrt(max(0.0, -cov)), 6)
    assert out[0]["n_obs"] == 39
    assert out[0]["roll_spread"] == pytest.approx(expected, abs=1e-9)


def test_roll_spread_positive_autocov_is_zero(spark):
    """Trending (positively autocorrelated) returns -> estimator
    clamps at 0 rather than emitting NaN from sqrt(negative)."""
    rows = [
        ("S", dt.date(2024, 1, 1) + dt.timedelta(days=i), 0.01 + 0.001 * i)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "symbol string, trade_date date, ret double")
    out = tseries.roll_spread(df).collect()
    assert out[0]["roll_spread"] == 0.0


def test_dq10_reconciliation_edges(spark, tmp_path):
    """One reconciled order (exact identity), one off by > a cent, one
    childless — the audit must classify all three."""
    orders = spark.createDataFrame(
        [
            (1, 1, "O", 106.08, dt.date(2024, 1, 1), "1-URGENT"),
            (2, 1, "F", 999.99, dt.date(2024, 1, 2), "2-HIGH"),
            (3, 1, "P", 50.0, dt.date(2024, 1, 3), "3-MEDIUM"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    # order 1: 100 * (1-0.0) * (1+0.0608) = 106.08 exactly; order 2: 10.00
    lineitem = spark.createDataFrame(
        [
            (1, 1, 1, 1, 1.0, 100.0, 0.0, 0.0608, "N", "O", dt.date(2024, 1, 5)),
            (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", dt.date(2024, 1, 6)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate date",
    )
    orders.write.parquet(f"{tmp_path}/orders.parquet")
    lineitem.write.parquet(f"{tmp_path}/lineitem.parquet")

    from market_data_pipeline_spark.plans.driver_queries import (
        dq10_order_price_reconciliation,
    )

    out = {r["order_status"]: r for r in dq10_order_price_reconciliation(spark, str(tmp_path)).collect()}
    assert out["O"]["n_reconciled"] == 1 and out["O"]["total_abs_diff"] == 0.0
    assert out["F"]["n_mismatched"] == 1
    assert out["F"]["total_abs_diff"] == pytest.approx(989.99, abs=1e-9)
    assert out["P"]["n_childless"] == 1 and out["P"]["n_mismatched"] == 0
