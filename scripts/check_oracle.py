"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from market_data_pipeline_spark.session import get_spark  # noqa: E402
from __spark_entry__ import oracle_sql, queries  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main():
    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oras = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        try:
            sdf = fn(spark, SF)
            spark_cols = sorted(sdf.columns)
            srows = sdf.collect()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oras:
            print(f"ok   {name}: rows-only ({len(srows)} rows, cols={spark_cols})")
            continue
        try:
            ddf = con.execute(oras[name]).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        duck_cols = sorted(ddf.column_names)
        if spark_cols != duck_cols:
            failures.append((name, f"cols {spark_cols} != {duck_cols}"))
            print(f"FAIL {name}: cols {spark_cols} vs {duck_cols}")
            continue
        drows = ddf.to_pylist()
        if len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} != {len(drows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        skey = sorted(
            tuple(str(norm(r[c])) for c in spark_cols) for r in (row.asDict() for row in srows)
        )
        dkey = sorted(tuple(str(norm(r[c])) for c in spark_cols) for r in drows)
        if skey != dkey:
            diff = [(a, b) for a, b in zip(skey, dkey) if a != b][:3]
            failures.append((name, f"values differ, first diffs: {diff}"))
            print(f"FAIL {name}: values differ ({len([1 for a,b in zip(skey,dkey) if a!=b])} rows), e.g. {diff}")
            continue
        print(f"PASS {name} ({len(srows)} rows)")
    print(f"\n{len(failures)} failures" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
