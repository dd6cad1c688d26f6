"""Unit tests for operators/timeseries.py and dedup.blocked_name_pairs
against hand-computed fixtures."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from market_data_pipeline_spark.operators import dedup as DD
from market_data_pipeline_spark.operators import timeseries as TS


def D(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("A", D("2024-01-01"), 10.0, 100),
        ("A", D("2024-01-02"), 20.0, 200),
        ("A", D("2024-01-03"), 15.0, 300),
        ("A", D("2024-01-08"), 30.0, 400),   # next ISO week
        ("B", D("2024-01-01"), 50.0, 500),
        ("B", D("2024-01-02"), 40.0, 600),
    ]
    return spark.createDataFrame(
        rows, "symbol string, trade_date date, close_price double, volume long"
    )


def test_sma_trailing_rows(series):
    out = {
        (r.symbol, r.trade_date): r.sma_2
        for r in TS.sma(series, 2).collect()
    }
    assert out[("A", D("2024-01-01"))] == 10.0          # warm-up: frame of 1
    assert out[("A", D("2024-01-02"))] == 15.0          # (10+20)/2
    assert out[("A", D("2024-01-03"))] == 17.5          # (20+15)/2
    assert out[("B", D("2024-01-02"))] == 45.0


def test_rolling_volatility_window(series):
    out = {
        (r.symbol, r.trade_date): (r.ret, r.vol_3)
        for r in TS.rolling_volatility(series, 3).collect()
    }
    assert out[("A", D("2024-01-01"))] == (None, None)   # no prev, <2 rets
    ret2, vol2 = out[("A", D("2024-01-02"))]
    assert ret2 == 1.0 and vol2 is None                  # single return
    ret3, vol3 = out[("A", D("2024-01-03"))]
    assert ret3 == 15.0 / 20.0 - 1
    # stddev_samp of [1.0, -0.25]
    assert vol3 == pytest.approx(0.883883, abs=1e-6)


def test_max_drawdown(series):
    out = {r.symbol: r.max_drawdown for r in TS.max_drawdown(series).collect()}
    # A: peaks 10,20,20,30 -> worst is 15/20-1 = -0.25
    assert out["A"] == pytest.approx(-0.25)
    # B: 50 then 40 -> -0.2
    assert out["B"] == pytest.approx(-0.2)


def test_resample_ohlc_weekly(series):
    bars = {
        (r.symbol, r.bucket): (r.open, r.high, r.low, r.close, r.volume)
        for r in TS.resample_ohlc(
            series, F.date_trunc("week", F.col("trade_date")).cast("date")
        ).collect()
    }
    assert bars[("A", D("2024-01-01"))] == (10.0, 20.0, 10.0, 15.0, 600)
    assert bars[("A", D("2024-01-08"))] == (30.0, 30.0, 30.0, 30.0, 400)
    assert bars[("B", D("2024-01-01"))] == (50.0, 50.0, 40.0, 40.0, 1100)


def test_asof_join_backward_semantics(spark, series):
    left = spark.createDataFrame(
        [
            ("A", D("2023-12-31")),  # before any right row -> null
            ("A", D("2024-01-02")),  # equal ts -> same-day row visible
            ("A", D("2024-01-05")),  # between rows -> latest earlier (01-03)
            ("C", D("2024-01-05")),  # key absent from right -> null
        ],
        "symbol string, asof date",
    )
    out = {
        (r.symbol, r.asof): r.close_price
        for r in TS.asof_join(
            left,
            series.select("symbol", "trade_date", "close_price"),
            on=["symbol"],
            left_ts="asof",
            right_ts="trade_date",
            value_cols=["close_price"],
        ).collect()
    }
    assert out[("A", D("2023-12-31"))] is None
    assert out[("A", D("2024-01-02"))] == 20.0
    assert out[("A", D("2024-01-05"))] == 15.0
    assert out[("C", D("2024-01-05"))] is None
    assert len(out) == 4  # exactly one output row per left row


def test_asof_join_prune_right_matches_unpruned(spark, series):
    # prune_right_to_left_keys must change the PLAN (right side reduced to
    # the probed keys), never the RESULT
    left = spark.createDataFrame(
        [("A", D("2024-01-05")), ("C", D("2024-01-05"))], "symbol string, asof date"
    )
    kwargs = dict(
        on=["symbol"], left_ts="asof", right_ts="trade_date",
        value_cols=["close_price"],
    )
    right = series.select("symbol", "trade_date", "close_price")
    plain = sorted(map(tuple, TS.asof_join(left, right, **kwargs).collect()))
    pruned = sorted(
        map(
            tuple,
            TS.asof_join(
                left, right, prune_right_to_left_keys=True, **kwargs
            ).collect(),
        )
    )
    assert plain == pruned


def test_asof_join_keeps_left_payload(spark, series):
    left = spark.createDataFrame(
        [("A", D("2024-01-05"), "q1")], "symbol string, asof date, tag string"
    )
    row = TS.asof_join(
        left,
        series.select("symbol", "trade_date", "close_price"),
        on=["symbol"],
        left_ts="asof",
        right_ts="trade_date",
        value_cols=["close_price"],
    ).collect()[0]
    assert row.tag == "q1" and row.close_price == 15.0


def test_blocked_name_pairs(spark):
    rows = [
        (1, 10, "Supplier#001"),
        (1, 11, "Supplier#002"),   # dist 1 from #001
        (1, 12, "Zupplier#999"),   # dist > 2 from both
        (2, 20, "Supplier#001"),   # other block: never paired with block 1
    ]
    df = spark.createDataFrame(rows, "nat int, sid long, name string")
    out = DD.blocked_name_pairs(df, "nat", "sid", "name", max_dist=2).collect()
    assert [(r.id_a, r.id_b, r.edit_dist) for r in out] == [(10, 11, 1)]


def test_sma_range_days_calendar_window(spark):
    # gapped series: rows at day 1, 2, 10 — a 3-row frame would always
    # include all prior rows; the 5-DAY frame must exclude the gap
    rows = [
        ("A", D("2024-01-01"), 10.0),
        ("A", D("2024-01-02"), 20.0),
        ("A", D("2024-01-10"), 40.0),
    ]
    df = spark.createDataFrame(rows, "symbol string, trade_date date, close_price double")
    out = {r.trade_date: r.sma_5d for r in TS.sma_range_days(df, 5).collect()}
    assert out[D("2024-01-02")] == 15.0   # both rows inside 5 days
    assert out[D("2024-01-10")] == 40.0   # gap: only itself


def test_snapshot_diff_classes(spark):
    from market_data_pipeline_spark.operators import upsert as UP

    old = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", None), (4, "d", 0)],
        "k int, name string, flag int",
    )
    new = spark.createDataFrame(
        [(2, "b", 1), (3, "c", 1), (4, "D", 0), (5, "e", 1)],
        "k int, name string, flag int",
    )
    out = {r.k: r.change for r in UP.snapshot_diff(old, new, "k").collect()}
    assert out == {1: "removed", 3: "changed", 4: "changed", 5: "added"}
    # k=2 unchanged -> absent; k=3 null->1 counts as change (eqNullSafe)


def test_partial_merge_equals_direct(spark):
    from market_data_pipeline_spark.operators import incremental as IVM

    rows = [
        ("A", D("2024-01-01"), 10.0, 100),
        ("B", D("2024-01-01"), 30.0, 50),
        ("A", D("2024-01-02"), 20.0, 200),
    ]
    price = spark.createDataFrame(
        rows, "symbol string, trade_date date, close_price double, volume long"
    )
    direct = IVM.finalize_summary(IVM.daily_summary_partial(price))
    split = IVM.finalize_summary(
        IVM.merge_partials(
            IVM.daily_summary_partial(price.filter(F.col("symbol") == "A")),
            IVM.daily_summary_partial(price.filter(F.col("symbol") == "B")),
        )
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, split.collect()))
    d = {r.trade_date: r for r in split.collect()}
    assert d[D("2024-01-01")].avg_close == 20.0 and d[D("2024-01-01")].n_rows == 2


def test_connected_components_chain_and_isolated_pair(spark):
    # chain 1-2-3-4 (diameter 3) plus pair (10, 11)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    out = {r.node: r.component for r in DD.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_interval_join_boundaries(spark):
    from market_data_pipeline_spark.operators import events as EV

    T = dt.datetime
    points = spark.createDataFrame(
        [
            (1, 7, T(2024, 1, 1, 10, 0)),    # == interval start (inclusive)
            (2, 7, T(2024, 1, 1, 11, 30)),   # inside, crosses bucket boundary
            (3, 7, T(2024, 1, 1, 12, 0)),    # == interval end (inclusive)
            (4, 7, T(2024, 1, 1, 12, 1)),    # just after -> no match
            (5, 8, T(2024, 1, 1, 10, 30)),   # other key -> other interval only
        ],
        "event_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (7, T(2024, 1, 1, 10, 0), T(2024, 1, 1, 12, 0)),
            (8, T(2024, 1, 1, 10, 0), T(2024, 1, 1, 10, 45)),
        ],
        "user_id long, s timestamp, e timestamp",
    )
    out = EV.interval_join(
        points, intervals, point_ts="ts", start_ts="s", end_ts="e",
        keys=["user_id"], bucket="1 hour",
    )
    got = sorted((r.event_id, r.user_id) for r in out.collect())
    assert got == [(1, 7), (2, 7), (3, 7), (5, 8)]


def test_bollinger_bands_known_values(spark):
    rows = [("A", D(f"2024-01-{d:02d}"), float(p)) for d, p in
            enumerate([10, 12, 14, 12, 10], start=1)]
    df = spark.createDataFrame(rows, "symbol string, trade_date date, close_price double")
    out = {r.trade_date: r for r in TS.bollinger_bands(df, n=3, k=2.0).collect()}
    import statistics
    # day 3 frame = [10, 12, 14]
    d3 = out[D("2024-01-03")]
    assert d3.sma_3 == pytest.approx(12.0)
    dev = round(statistics.stdev([10, 12, 14]), 6)
    assert d3.band_dev == pytest.approx(dev)
    assert d3.upper_band == pytest.approx(round(12.0 + 2 * dev, 6))
    assert d3.lower_band == pytest.approx(round(12.0 - 2 * dev, 6))
    # single-row frame: sample stddev undefined -> null bands
    assert out[D("2024-01-01")].band_dev is None


def test_rsi_known_values(spark):
    # diffs: +2, +2, -1, -1 ; frame n=3 over diffs
    rows = [("A", D(f"2024-01-{d:02d}"), float(p)) for d, p in
            enumerate([10, 12, 14, 13, 12], start=1)]
    df = spark.createDataFrame(rows, "symbol string, trade_date date, close_price double")
    out = {r.trade_date: r.rsi_3 for r in TS.rsi(df, n=3).collect()}
    assert out[D("2024-01-01")] is None          # no prior price
    assert out[D("2024-01-02")] == 100.0         # only gains
    # day 4: diffs in frame = [+2, +2, -1]: avg gain 4/3, avg loss 1/3
    rs = (4 / 3) / (1 / 3)
    assert out[D("2024-01-04")] == pytest.approx(round(100 - 100 / (1 + rs), 6))
    # day 5: diffs [+2, -1, -1]: avg gain 2/3, avg loss 2/3 -> RSI 50
    assert out[D("2024-01-05")] == pytest.approx(50.0)


def test_rolling_pair_corr(spark):
    # A and B perfectly anti-correlated, A and C perfectly correlated
    rows = []
    for d, x in enumerate([0.01, -0.02, 0.03, -0.01, 0.02], start=1):
        rows.append(("A", D(f"2024-01-{d:02d}"), x))
        rows.append(("B", D(f"2024-01-{d:02d}"), -x))
        rows.append(("C", D(f"2024-01-{d:02d}"), 2 * x))
    rets = spark.createDataFrame(
        rows, "symbol string, trade_date date, daily_return double"
    )
    out = {
        (r.key_a, r.key_b, r.trade_date): r.corr_3
        for r in TS.rolling_pair_corr(
            rets, pairs=[("A", "B"), ("A", "C")], n=3
        ).collect()
    }
    assert out[("A", "B", D("2024-01-01"))] is None       # 1-point frame
    assert out[("A", "B", D("2024-01-03"))] == -1.0
    assert out[("A", "C", D("2024-01-05"))] == 1.0
    assert len(out) == 10  # 5 dates x 2 pairs, nothing else


def test_forward_fill_carries_last_observation(spark):
    import datetime as dt

    from market_data_pipeline_spark.operators.timeseries import forward_fill

    base = dt.date(2020, 1, 1)
    rows = [
        ("A", base, None),                      # before first obs: stays NULL
        ("A", base + dt.timedelta(days=1), 10.0),
        ("A", base + dt.timedelta(days=2), None),
        ("A", base + dt.timedelta(days=3), None),
        ("A", base + dt.timedelta(days=4), 40.0),
        ("B", base, 7.0),
        ("B", base + dt.timedelta(days=1), None),
    ]
    df = spark.createDataFrame(rows, "symbol string, trade_date date, px double")
    out = {
        (r["symbol"], str(r["trade_date"])): r["px_filled"]
        for r in forward_fill(df, ["px"], order_col="trade_date").collect()
    }
    assert out[("A", "2020-01-01")] is None          # no back-fill
    assert out[("A", "2020-01-02")] == 10.0
    assert out[("A", "2020-01-03")] == 10.0
    assert out[("A", "2020-01-04")] == 10.0
    assert out[("A", "2020-01-05")] == 40.0
    assert out[("B", "2020-01-02")] == 7.0           # fills don't cross series
