"""NULL-injection engine-parity sweep: clone sf0.001 with deterministic
NULLs injected into the plausibly-nullable VALUE columns (never keys,
never partition columns), then run every oracled queries() entry on
Spark AND its oracle_sql() on DuckDB over the SAME nulled tables and
compare with the oracle gate's own compare().

Motivation (r6 advisor, iv8/iv9): Spark windows ORDER BY NULLS FIRST,
DuckDB NULLS LAST; NULL arithmetic, rank ties, min_by/max_by and CASE
fall-throughs all diverge silently — and the shipped testdata contains
no NULLs, so the per-round gate can never catch this class. This sweep
is the registry-wide version of the iv8/iv9 hunt.

Columns nulled (every 13th row by key hash, ~7.7%):
  events.value events.props documents.text documents.lang
  documents.source customer.c_acctbal supplier.s_acctbal
  part.p_retailprice

A two-sided 0-row match here is WARN, not FAIL: the degenerate-empty
policy guards query AUTHORING at sf0.01; under adversarial inputs an
empty match is acceptable. Rows-only queries are SKIPPED (no oracle to
diverge from) except that a crash still FAILs.

Usage: python scripts/null_sweep.py [query ...]
Exit 1 on any true divergence or crash.
"""

from __future__ import annotations

import os
import shutil
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "null_tables")
SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# table -> (key column for the deterministic hash, columns to null)
NULLED: dict[str, tuple[str, list[str]]] = {
    "events": ("event_id", ["value", "props"]),
    "documents": ("doc_id", ["text", "lang", "source"]),
    "customer": ("c_custkey", ["c_acctbal"]),
    "supplier": ("s_suppkey", ["s_acctbal"]),
    "part": ("p_partkey", ["p_retailprice"]),
}
EVERY = 13


def build_nulled() -> None:
    import duckdb

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t in NULLED:
            key, cols = NULLED[t]
            all_cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
                ).fetchall()
            ]
            sel = ", ".join(
                f"CASE WHEN {key} % {EVERY} = 0 THEN NULL ELSE {c} END AS {c}"
                if c in cols
                else c
                for c in all_cols
            )
            con.execute(
                f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet') "
                f"TO '{SCRATCH}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            shutil.copy(f"{SRC}/{t}.parquet", f"{SCRATCH}/{t}.parquet")


def main() -> int:
    import duckdb

    only = set(sys.argv[1:])
    build_nulled()

    from market_data_pipeline_spark.session import get_spark
    from __spark_entry__ import oracle_sql, queries
    from check_oracle import compare  # same comparator the gate runs

    spark = get_spark("null-sweep", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SCRATCH}/{t}.parquet'")

    qs, oras = queries(), oracle_sql()
    failures, warns = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oras:
            # rows-only: no oracle to diverge from; crashes still count
            try:
                fn(spark, SCRATCH).collect()
                print(f"skip  {name}: rows-only (no crash)")
            except Exception:
                failures.append((name, "rows-only CRASH on nulled input"))
                tb = traceback.format_exc().strip().splitlines()[-1][:160]
                print(f"FAIL  {name}: rows-only crash {tb}")
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
        status, msg = compare(name, spark_cols, srows, ddf.column_names, ddf.to_pylist())
        if status == "FAIL" and "degenerate 0-row" in msg:
            warns.append(name)
            print(f"WARN  {name}: two-sided empty under nulled input")
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
