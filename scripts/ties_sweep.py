r"""Timestamp-tie determinism sweep: clone sf0.001 with events.ts
coarsened to the minute on two of every three rows — mass-producing
exact ORDER BY ties inside every per-user window — then run every
oracled query on Spark AND DuckDB over the SAME tied tables and
compare with the gate's compare().

Motivation: the repo's discipline is that every window/sort carries a
deterministic tiebreaker (ts, event_id), because engines are free to
order ties differently and LAG/LEAD/ROW_NUMBER over an ambiguous order
is nondeterministic BETWEEN engines (and between Spark runs under
retries). The shipped testdata has microsecond-distinct timestamps, so
the per-round gate never actually exercises ties; this sweep does, and
any query that diverges here is ordering by an under-specified key.

Usage: python scripts/ties_sweep.py [query ...]
Exit 1 on any divergence or crash.
"""

from __future__ import annotations

import os
import shutil
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "tied_tables")
SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def build_tied() -> None:
    import duckdb

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
  SELECT event_id,
         CASE WHEN event_id % 3 <> 0 THEN date_trunc('minute', ts)
              ELSE ts END AS ts,
         user_id, event_type, value, props
  FROM '{SRC}/events.parquet'
) TO '{SCRATCH}/events.parquet' (FORMAT PARQUET)"""
            )
        else:
            shutil.copy(f"{SRC}/{t}.parquet", f"{SCRATCH}/{t}.parquet")


def main() -> int:
    import duckdb

    only = set(sys.argv[1:])
    build_tied()

    from market_data_pipeline_spark.session import get_spark
    from __spark_entry__ import oracle_sql, queries
    from check_oracle import compare

    spark = get_spark("ties-sweep", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SCRATCH}/{t}.parquet'")

    qs, oras = queries(), oracle_sql()
    failures, warns = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oras:
            continue  # rows-only: nothing to diverge from
        if "events" not in oras[name]:
            continue  # ts untouched -> parity already covered by the gate
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
            print(f"WARN  {name}: two-sided empty under tied input")
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
