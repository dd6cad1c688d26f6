"""Round-8 property tests for the freeze-lift registrations and the
§G-100x operator rewrite: salted two-phase aggregation vs a pure-Python
exact reference, grouped (stratified) kNN vs numpy, and the
deletion-neighborhood candidate generation vs a brute-force Levenshtein
over hypothesis-generated name corpora (the class of inputs — unicode,
repeats, empty strings, near-misses at the threshold — no hand fixture
covers)."""

from __future__ import annotations

import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),  # block
            st.text(
                alphabet="abχé #0",  # tight alphabet forces near-misses
                min_size=0,
                max_size=9,
            ),
        ),
        min_size=0,
        max_size=14,
    ),
    max_dist=st.integers(1, 2),
)
@SET
def test_deletion_pairs_match_bruteforce(spark, rows, max_dist):
    from market_data_pipeline_spark.operators import dedup as DD

    data = [(blk, i, nm) for i, (blk, nm) in enumerate(rows)]
    want = sorted(
        (blk, ia, ib, _lev(na, nb))
        for blk, ia, na in data
        for blk2, ib, nb in data
        if blk == blk2 and ia < ib and _lev(na, nb) <= max_dist
    )
    if not data:
        return
    df = spark.createDataFrame(data, "blk int, id long, nm string")
    got = sorted(
        map(
            tuple,
            DD.blocked_name_pairs(
                df, "blk", "id", "nm", max_dist=max_dist, deletion_min_rows=0
            ).collect(),
        )
    )
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),
            st.one_of(
                st.none(),
                st.floats(
                    min_value=-1e6,
                    max_value=1e6,
                    allow_nan=False,
                    allow_infinity=False,
                ).map(lambda x: round(x, 2)),
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_salted_group_agg_property(spark, rows):
    """Two-phase salted aggregation == exact per-key (count, cent-sum)
    computed in pure Python over the same fixed-point transform the
    skw2 query applies."""
    from market_data_pipeline_spark.operators.skew import salted_group_agg

    df = spark.createDataFrame(rows, "k int, v double").select(
        "k", F.round(F.col("v") * 100).alias("cents")
    )
    out = {
        r.k: (r.n_rows, None if r.sum_cents is None else int(r.sum_cents))
        for r in salted_group_agg(df, ["k"], sum_cols=["cents"], salt_buckets=3).collect()
    }
    want_n: dict[int, int] = defaultdict(int)
    want_s: dict[int, int | None] = {}
    for k, v in rows:
        want_n[k] += 1
        if v is not None:
            # Spark ROUND on double is HALF_UP on the decimal repr
            from decimal import ROUND_HALF_UP, Decimal

            c = int(
                Decimal(repr(v * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
            )
            want_s[k] = want_s.get(k) or 0
            want_s[k] += c
        else:
            want_s.setdefault(k, None)
    want = {k: (want_n[k], want_s[k]) for k in want_n}
    assert out == want


@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 1),  # label
            st.lists(
                st.floats(
                    min_value=-10,
                    max_value=10,
                    allow_nan=False,
                    allow_infinity=False,
                ),
                min_size=3,
                max_size=3,
            ),
        ),
        min_size=2,
        max_size=15,
    ),
    k=st.integers(1, 3),
)
@SET
def test_grouped_knn_matches_numpy(spark, vecs, k):
    import numpy as np

    from market_data_pipeline_spark.operators import similarity as SIM

    q = [1.0, 0.5, -0.25]
    data = [(i, str(lbl), v) for i, (lbl, v) in enumerate(vecs)]
    df = spark.createDataFrame(
        data, "vec_id long, label string, embedding array<double>"
    )
    got = [
        (r.label, r.rank, r.vec_id)
        for r in SIM.grouped_knn(df, q, k=k).orderBy("label", "rank").collect()
    ]
    qa = np.array(q)
    scored = []
    for i, lbl, v in data:
        va = np.array(v)
        den = np.linalg.norm(va) * np.linalg.norm(qa)
        cos = None if den == 0 else round(float(va @ qa / den), 6)
        scored.append((lbl, i, cos))
    want = []
    for lbl in sorted({s[0] for s in scored}):
        group = [s for s in scored if s[0] == lbl]
        # cosine DESC NULLS LAST, id ASC — the oracle's order
        group.sort(key=lambda s: (s[2] is None, -(s[2] or 0), s[1]))
        for rank, (_, i, _) in enumerate(group[:k], 1):
            want.append((lbl, rank, i))
    assert got == want
