"""Property-based test for the persisted IVF index round-trip
(r5 verdict #5): build -> append -> query must equal an independent
pure-Python replica of the IVF contract (assign to nearest centroid,
probe n_probe lists, exact top-k within the probed lists) over
hypothesis-generated vector sets — including empty appends, duplicate-id
appends, and n_probe below/above the centroid count.

Integer-valued components keep every dot product and squared norm
exactly representable, so Spark's sequential JVM fold and the Python
reference produce bit-identical cosines (sqrt/division are correctly
rounded on identical inputs) — equality checks, no tolerances.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _round6(x: float) -> float:
    """Replicate Spark's ROUND(x, 6): BigDecimal.valueOf(double) (shortest
    decimal repr, same as Python's repr) quantized HALF_UP."""
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _cos(a, b) -> float:
    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    return _round6(dot / (math.sqrt(na) * math.sqrt(nb)))


def _ref_ivf(corpus, centroids, queries, k, n_probe):
    """Pure-Python IVF: assign each corpus row to its nearest centroid
    (max rounded cosine, lowest centroid id on ties), probe each query's
    top-n_probe centroids (same ordering), exact top-k within the probed
    lists (cosine desc, id asc), self-id excluded."""
    def nearest(vec):
        return min(
            ((-_cos(vec, cv), cid) for cid, cv in centroids), key=lambda t: t
        )[1]

    assign = {i: nearest(v) for i, (_, v) in enumerate(corpus)}
    out = []
    for qid, qv in queries:
        probe_order = sorted(
            ((-_cos(qv, cv), cid) for cid, cv in centroids), key=lambda t: t
        )
        probed = {cid for _, cid in probe_order[:n_probe]}
        cands = [
            (vid, _cos(qv, vv))
            for i, (vid, vv) in enumerate(corpus)
            if assign[i] in probed and vid != qid
        ]
        cands.sort(key=lambda t: (-t[1], t[0]))
        out.extend(
            (qid, vid, c, r + 1) for r, (vid, c) in enumerate(cands[:k])
        )
    return sorted(out)


@st.composite
def ivf_case(draw):
    dim = draw(st.integers(min_value=2, max_value=4))
    nonzero_vec = st.lists(
        st.integers(min_value=-3, max_value=3), min_size=dim, max_size=dim
    ).filter(lambda v: any(x != 0 for x in v))
    n_base = draw(st.integers(min_value=3, max_value=10))
    base = [(i, draw(nonzero_vec)) for i in range(n_base)]
    n_append = draw(st.integers(min_value=0, max_value=5))  # 0 = empty append
    dup_ids = draw(st.booleans())
    appended = []
    for j in range(n_append):
        vid = (j % n_base) if dup_ids else n_base + j
        appended.append((vid, draw(nonzero_vec)))
    n_centroids = draw(st.integers(min_value=1, max_value=3))
    # centroids: distinct ids, drawn vectors (not necessarily corpus rows)
    cents = [(c, draw(nonzero_vec)) for c in range(n_centroids)]
    queries = [(1000 + q, draw(nonzero_vec)) for q in range(draw(st.integers(1, 2)))]
    k = draw(st.integers(min_value=1, max_value=4))
    n_probe = draw(st.integers(min_value=1, max_value=4))
    return dim, base, appended, cents, queries, k, n_probe


@SET
@given(ivf_case())
def test_ivf_build_append_query_matches_reference(spark, tmp_path_factory, case):
    from market_data_pipeline_spark.operators.similarity import (
        append_to_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )

    dim, base, appended, cents, queries, k, n_probe = case
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    schema = "vec_id long, embedding array<double>"
    to_df = lambda rows: spark.createDataFrame(  # noqa: E731
        [(i, [float(x) for x in v]) for i, v in rows], schema
    )
    cdf = to_df(cents)

    build_ivf_index(to_df(base), path, cdf)
    append_to_ivf_index(to_df(appended), path, cdf)

    got = sorted(
        (r["query_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in query_ivf_index(
            spark, path, to_df(queries), cdf, k=k, n_probe=n_probe
        ).collect()
    )
    want = _ref_ivf(base + appended, cents, queries, k, n_probe)
    # duplicate-id appends can tie exactly (same id, same cosine): the
    # row_number order between IDENTICAL rows is arbitrary but the
    # emitted tuples are interchangeable, so sorted-tuple equality holds
    assert got == want


# --- containment_pairs vs pure-python shingle reference ----------------------


def _py_shingles(text, n=3):
    toks = [t for t in text.lower().strip().split() if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
            min_size=0,
            max_size=12,
        ),
        min_size=2,
        max_size=8,
    ),
    st.sampled_from([0.3, 0.5, 0.8, 1.0]),
)
def test_containment_pairs_match_python_reference(spark, docs_tokens, threshold):
    """Directed containment over random small-vocab docs must equal the
    set-arithmetic reference exactly (counts are integers, containment
    is an exact integer division)."""
    from market_data_pipeline_spark.operators.dedup import containment_pairs

    rows = [(i, " ".join(toks), "en") for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["doc_id"], r["other_id"]): (r["common"], r["containment"])
        for r in containment_pairs(df, threshold=threshold).collect()
    }
    sh = {i: _py_shingles(t) for i, t, _ in rows}
    want = {}
    for a in sh:
        for b in sh:
            if a == b or not sh[a]:
                continue
            common = len(sh[a] & sh[b])
            if common and common / len(sh[a]) >= threshold:
                want[(a, b)] = (common, common / len(sh[a]))
    assert got == want


# --- scd2_history vs pure-python reference -----------------------------------


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # key
            st.integers(min_value=0, max_value=10),  # day offset
            st.sampled_from(["A", "B", "C"]),        # value
        ),
        min_size=1,
        max_size=30,
    )
)
def test_scd2_history_matches_python_reference(spark, events):
    """SCD-2 intervals from a random event stream (with same-day
    flapping and duplicate rows) must equal the per-key sequential
    reference: daily latest-writer-wins, run collapse, next-start-minus-
    one closing."""
    import datetime as dt

    from market_data_pipeline_spark.operators.incremental import scd2_history

    d0 = dt.date(2024, 1, 1)
    rows = [
        (k, d0 + dt.timedelta(days=off), v, seq)
        for seq, (k, off, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k long, dt date, status string, seq long")
    got = sorted(
        (r["k"], r["status"], r["valid_from"], r["valid_to"], r["is_current"], r["n_days"])
        for r in scd2_history(df, "k", "dt", "status", "seq").collect()
    )

    # reference
    daily = {}
    for k, day, v, seq in rows:
        cur = daily.get((k, day))
        if cur is None or seq > cur[1]:
            daily[(k, day)] = (v, seq)
    per_key = {}
    for (k, day), (v, _) in sorted(daily.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        per_key.setdefault(k, []).append((day, v))
    want = []
    for k, seq_days in per_key.items():
        runs = []
        for day, v in seq_days:
            if runs and runs[-1][0] == v:
                runs[-1][2] += 1
            else:
                runs.append([v, day, 1])
        for i, (v, start, ndays) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            want.append(
                (
                    k,
                    v,
                    start,
                    (nxt - dt.timedelta(days=1)) if nxt else None,
                    nxt is None,
                    ndays,
                )
            )
    assert got == sorted(want)
