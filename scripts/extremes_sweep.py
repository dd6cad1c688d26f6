r"""Extreme-value engine-parity sweep: clone sf0.001 with adversarial
magnitudes and signs injected into the numeric value columns, then run
every oracled query on Spark AND DuckDB over the SAME tables and
compare with the gate's compare().

Motivation (r6 advisor, k22): fixed-point tricks (value*100 cents,
1e12-scaled folds) carry magnitude preconditions that wrap BIGINT
silently in non-ANSI Spark while DuckDB errors — and sign assumptions
(log of a return, sqrt of a variance) turn into NaN-vs-NULL
divergences. The shipped testdata is benign (positive, moderate), so
the per-round gate never stresses these paths.

Injection (deterministic by key):
  events.value   : *1e6 on every 17th row, negated on every 19th
  customer.c_acctbal / supplier.s_acctbal: negated on every 7th row
  lineitem.l_extendedprice: *1e6 on every 13th line (revenue sums —
    the most common decimal-cast aggregate shape in the registry)
  lineitem.l_discount: 0.0 on every 23rd row (zero-division probes)
  orders.o_totalprice: *1e6 on every 31st row

A two-sided 0-row match is WARN (adversarial inputs may legitimately
empty a result). Rows-only queries are skipped. Exit 1 on any true
divergence or crash.

ULP waiver (THIS sweep only, never the clean gate): a values-differ
result is re-checked float-by-float at RELATIVE tolerance 1e-9 and
reported "ok (ulp)" if every numeric delta is inside it. Rationale,
measured: DuckDB's DECIMAL/HUGEINT -> DOUBLE casts are not correctly
rounded past 2^53 while Spark's and Python's are, so any exact-sum
query whose magnitudes this sweep pushes past ~1e16 shows last-ULP
drift that no oracle rewrite short of a VARCHAR hop can remove — an
oracle-infrastructure limit, not a product bug. Everything the sweep
exists to catch sits far above 1e-9 relative: corrupted state is
orders of magnitude off, a flipped sign is 2e0, a lost cent on a
money value is ~1e-6.

Usage: python scripts/extremes_sweep.py [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "extreme_tables")
SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

REWRITES = {
    "events": """
  SELECT event_id, ts, user_id, event_type,
         CASE WHEN event_id % 19 = 0 THEN -1 ELSE 1 END
           * CASE WHEN event_id % 17 = 0 THEN value * 1e6 ELSE value END
           AS value,
         props
  FROM '{src}'""",
    "customer": """
  SELECT c_custkey, c_name, c_nationkey,
         CASE WHEN c_custkey % 7 = 0 THEN -c_acctbal ELSE c_acctbal END
           AS c_acctbal,
         c_mktsegment
  FROM '{src}'""",
    "supplier": """
  SELECT s_suppkey, s_name, s_nationkey,
         CASE WHEN s_suppkey % 7 = 0 THEN -s_acctbal ELSE s_acctbal END
           AS s_acctbal
  FROM '{src}'""",
    "lineitem": """
  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
         CASE WHEN (l_orderkey + l_linenumber) % 13 = 0
              THEN l_extendedprice * 1e6 ELSE l_extendedprice END
           AS l_extendedprice,
         CASE WHEN (l_orderkey * 10 + l_linenumber) % 23 = 0
              THEN 0.0 ELSE l_discount END AS l_discount,
         l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{src}'""",
    "orders": """
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice * 1e6
              ELSE o_totalprice END AS o_totalprice,
         o_orderdate, o_orderpriority
  FROM '{src}'""",
}


def build_extreme() -> None:
    import duckdb

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t in REWRITES:
            sel = REWRITES[t].format(src=f"{SRC}/{t}.parquet")
            con.execute(
                f"COPY ({sel}) TO '{SCRATCH}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            shutil.copy(f"{SRC}/{t}.parquet", f"{SCRATCH}/{t}.parquet")


def _within_ulp_tolerance(spark_cols, srows, duck_cols, drows) -> bool:
    """True iff the two row sets match exactly on non-floats and within
    1e-9 RELATIVE on floats (see the ULP-waiver note in the module doc).
    Rows are aligned by their non-float fields; ambiguous alignments
    (duplicate non-float keys) fall back to sorted float tuples."""
    import math

    if sorted(spark_cols) != sorted(duck_cols) or len(srows) != len(drows):
        return False
    cols = sorted(spark_cols)

    def split(row):
        key, floats = [], []
        for c in cols:
            v = row[c]
            (floats if isinstance(v, float) else key).append(v)
        return tuple(str(k) for k in key), floats

    def group(rows):
        g = {}
        for r in rows:
            k, f = split(r)
            g.setdefault(k, []).append(sorted(f, key=lambda x: (math.isnan(x), x)))
        return g

    gs, gd = group(srows), group(drows)
    if gs.keys() != gd.keys():
        return False
    for k in gs:
        a, b = sorted(gs[k]), sorted(gd[k])
        if len(a) != len(b):
            return False
        for fa, fb in zip(a, b):
            if len(fa) != len(fb):
                return False
            for x, y in zip(fa, fb):
                if math.isnan(x) and math.isnan(y):
                    continue
                if not math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9):
                    return False
    return True


def main() -> int:
    import duckdb

    only = set(sys.argv[1:])
    build_extreme()

    from market_data_pipeline_spark.session import get_spark
    from __spark_entry__ import oracle_sql, queries
    from check_oracle import compare

    spark = get_spark("extremes-sweep", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SCRATCH}/{t}.parquet'")

    qs, oras = queries(), oracle_sql()
    failures, warns = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oras:
            continue
        try:
            sdf = fn(spark, SCRATCH)
            spark_cols = list(sdf.columns)
            srows = [row.asDict() for row in sdf.collect()]
        except Exception:
            failures.append((name, "SPARK CRASH"))
            tb = traceback.format_exc().strip().splitlines()[-1][:160]
            print(f"FAIL  {name}: spark crash {tb}")
            continue
        try:
            ddf = con.execute(oras[name]).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {str(e)[:160]}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:160]}")
            continue
        drows = ddf.to_pylist()
        status, msg = compare(name, spark_cols, srows, ddf.column_names, drows)
        if status == "FAIL" and "degenerate 0-row" in msg:
            warns.append(name)
            print(f"WARN  {name}: two-sided empty under extreme input")
        elif status == "FAIL" and "values differ" in msg and _within_ulp_tolerance(
            spark_cols, srows, ddf.column_names, drows
        ):
            print(f"ok    {name}: {len(srows)} rows (ulp — see module doc)")
        elif status == "FAIL":
            failures.append((name, msg))
            print(f"FAIL  {name}: {msg[:300]}")
        else:
            print(f"ok    {name}: {msg}")
    print(f"\n{len(failures)} divergence(s), {len(warns)} empty-warn(s)")
    for n, m in failures:
        print(f"  DIVERGE {n}: {m[:200]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    raise SystemExit(main())
