"""Property-based tests for the round-5 operators — each checked against
an independent pure-Python reference over hypothesis-generated inputs
(small example counts; the point is edge cases: ties, flats, empty
groups, unicode)."""

from __future__ import annotations

import datetime as dt
import itertools

import pytest
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from market_data_pipeline_spark.operators import events as ev
from market_data_pipeline_spark.operators import text as tx
from market_data_pipeline_spark.operators import timeseries as tseries

SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

D0 = dt.date(2024, 1, 1)
T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


# --- streak_stats vs itertools.groupby islands -------------------------------


@SET
@given(st.lists(st.integers(min_value=-1, max_value=1), min_size=1, max_size=40))
def test_streaks_match_groupby(spark, steps):
    """Closes from a +1/0/-1 step walk; longest up/down runs must match
    a direct groupby over the sign sequence (flats break runs)."""
    closes, c = [], 100.0
    for s in steps:
        c += s
        closes.append(c)
    df = spark.createDataFrame(
        [
            ("A", D0 + dt.timedelta(days=i), float(v), 1, 1.0)
            for i, v in enumerate(closes)
        ],
        "symbol string, trade_date date, close_price double, volume long, amount double",
    )
    rows = tseries.streak_stats(df).collect()
    signs = [
        (0 if b == a else (1 if b > a else -1))
        for a, b in zip(closes, closes[1:])
    ]
    want_up = want_down = None
    for sgn, grp in itertools.groupby(signs):
        n = len(list(grp))
        if sgn == 1:
            want_up = max(want_up or 0, n)
        elif sgn == -1:
            want_down = max(want_down or 0, n)
    if not signs:
        assert rows == []
        return
    r = rows[0]
    assert r["longest_up"] == want_up
    assert r["longest_down"] == want_down


# --- on_balance_volume vs numpy ---------------------------------------------


@SET
@given(
    st.lists(
        st.tuples(st.integers(-3, 3), st.integers(1, 50)),
        min_size=1,
        max_size=30,
    )
)
def test_obv_matches_reference(spark, walk):
    closes, c = [], 100
    vols = []
    for step, v in walk:
        c += step
        closes.append(c)
        vols.append(v)
    df = spark.createDataFrame(
        [
            ("A", D0 + dt.timedelta(days=i), float(cl), int(v), 1.0)
            for i, (cl, v) in enumerate(zip(closes, vols))
        ],
        "symbol string, trade_date date, close_price double, volume long, amount double",
    )
    r = tseries.on_balance_volume(df).collect()[0]
    obv, run, peak = 0, [], None
    for i in range(len(closes)):
        if i > 0:
            d = closes[i] - closes[i - 1]
            obv += (1 if d > 0 else (-1 if d < 0 else 0)) * vols[i]
        run.append(obv)
        peak = obv if peak is None else max(peak, obv)
    assert r["obv_final"] == run[-1]
    assert r["obv_peak"] == peak
    assert r["n_days"] == len(closes)


# --- interarrival_stats vs manual gaps --------------------------------------


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 100000)),
        min_size=1,
        max_size=40,
    )
)
def test_interarrival_matches_reference(spark, pairs):
    rows = [
        (i, T0 + dt.timedelta(milliseconds=ms), u, "e", 0.0)
        for i, (u, ms) in enumerate(pairs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r["user_id"]: r for r in ev.interarrival_stats(df).collect()}
    by_user: dict[int, list] = {}
    for i, (u, ms) in enumerate(pairs):
        by_user.setdefault(u, []).append((ms, i))
    for u, evs in by_user.items():
        evs.sort()
        gaps = [b[0] - a[0] for a, b in zip(evs, evs[1:])]
        if not gaps:
            assert u not in got
            continue
        r = got[u]
        assert r["n_gaps"] == len(gaps)
        assert r["mean_gap_sec"] == pytest.approx(
            sum(gaps) / 1000 / len(gaps), abs=1e-9
        )
        assert r["max_gap_sec"] == pytest.approx(max(gaps) / 1000, abs=1e-9)


# --- charset_stats vs python string ops -------------------------------------


@SET
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=0x2600),
            max_size=60,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_charset_stats_match_python(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in tx.charset_stats(df).collect()}
    for i, t in enumerate(texts):
        r = got[i]
        assert r["n_chars"] == len(t)
        if not t:
            assert r["ascii_ratio"] is None
            continue
        ascii_n = sum(1 for ch in t if 0x20 <= ord(ch) <= 0x7E)
        digit_n = sum(1 for ch in t if ch.isdigit() and ch.isascii())
        upper_n = sum(1 for ch in t if "A" <= ch <= "Z")
        space_n = sum(1 for ch in t if ch in " \t\n\r")
        assert r["ascii_ratio"] == pytest.approx(ascii_n / len(t), abs=1e-6)
        assert r["digit_ratio"] == pytest.approx(digit_n / len(t), abs=1e-6)
        assert r["upper_ratio"] == pytest.approx(upper_n / len(t), abs=1e-6)
        assert r["space_ratio"] == pytest.approx(space_n / len(t), abs=1e-6)


# --- stickiness identity -----------------------------------------------------


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 27)),
        min_size=1,
        max_size=60,
    )
)
def test_stickiness_matches_reference(spark, pairs):
    """avg_dau * n_days == total distinct (day,user) pairs, and
    stickiness == avg_dau / mau, for arbitrary activity patterns inside
    one month."""
    rows = [
        (i, T0 + dt.timedelta(days=d), u, "view", 0.0)
        for i, (u, d) in enumerate(pairs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = ev.stickiness(df).collect()
    assert len(out) == 1
    r = out[0]
    du = {(d, u) for u, d in pairs}
    days = {d for _, d in pairs}
    users = {u for u, _ in pairs}
    assert r["n_days"] == len(days)
    assert r["mau"] == len(users)
    assert r["avg_dau"] == pytest.approx(len(du) / len(days), abs=1e-9)
    assert r["stickiness"] == pytest.approx(
        len(du) / len(days) / len(users), abs=1e-9
    )


# --- Gini closed form vs brute-force mean-absolute-difference -----------------


@SET
@given(st.lists(st.integers(min_value=1, max_value=10000), min_size=2, max_size=30))
def test_gini_closed_form_matches_definition(spark, amounts):
    """The sorted-rank Gini (a18's closed form) equals the
    mean-absolute-difference definition G = sum|xi-xj| / (2 n^2 mu)."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(f"s{i:03d}", float(a)) for i, a in enumerate(amounts)],
        "symbol string, total_amount double",
    )
    cents = F.round(F.col("total_amount") * 100).cast("long")
    wr = Window.orderBy(cents, F.col("symbol"))
    rk = df.select(
        cents.alias("_c"),
        F.row_number().over(wr).alias("_i"),
    )
    n = len(amounts)
    tot = sum(a * 100 for a in amounts)
    got = rk.agg(
        (
            2.0 * F.sum(F.col("_i") * F.col("_c")) / (n * tot)
            - (n + 1.0) / n
        ).alias("g")
    ).collect()[0]["g"]
    xs = [a * 100 for a in amounts]
    mad = sum(abs(x - y) for x in xs for y in xs)
    want = mad / (2 * n * n * (sum(xs) / n))
    assert got == pytest.approx(want, abs=1e-9)


# --- exact-power-sum moments vs numpy ----------------------------------------


@SET
@given(
    st.lists(
        st.floats(min_value=-0.2, max_value=0.2, allow_nan=False),
        min_size=5,
        max_size=50,
    )
)
def test_moment_algebra_matches_numpy(spark, rets):
    """ts40's closed-form skew/kurtosis from fixed-point power sums
    matches numpy's population moments (within the 1e-9/1e-15
    fixed-point granularity)."""
    import numpy as np

    arr = np.round(np.array(rets), 6)  # stay well inside fp granularity
    if np.var(arr) < 1e-8:
        return
    n = len(arr)
    s1 = np.round(arr * 1e9).sum() / 1e9
    s2 = np.round(arr * arr * 1e12).sum() / 1e12
    s3 = np.round(arr**3 * 1e15).sum() / 1e15
    s4 = np.round(arr**4 * 1e15).sum() / 1e15
    m1, m2, m3, m4 = s1 / n, s2 / n, s3 / n, s4 / n
    var = m2 - m1**2
    skew_cf = (m3 - 3 * m1 * m2 + 2 * m1**3) / var**1.5
    kurt_cf = (m4 - 4 * m1 * m3 + 6 * m1**2 * m2 - 3 * m1**4) / var**2 - 3
    c = arr - arr.mean()
    skew_np = (c**3).mean() / ((c**2).mean()) ** 1.5
    kurt_np = (c**4).mean() / ((c**2).mean()) ** 2 - 3
    assert skew_cf == pytest.approx(skew_np, abs=1e-4)
    assert kurt_cf == pytest.approx(kurt_np, abs=1e-3)
