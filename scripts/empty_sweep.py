"""Registry-wide empty-input sweep: run EVERY queries() entry against a
directory of 0-row tables (schemas cloned from sf0.001) and report which
ones crash instead of returning an empty/degenerate result.

Motivation (r6 advisor, o2_keyset_pagination): a query that collect()s a
cursor/anchor scalar and indexes [0], or folds a MIN/MAX into a literal,
works at every bench scale and still crashes on the empty partition a
real pipeline feeds it on day one. tests/test_empty_inputs.py covers the
core OPERATORS; this sweeps the full registered query surface.

Usage: python scripts/empty_sweep.py [query ...]
Writes nothing; prints ok/CRASH per query and a summary. Exit 1 on any
crash so it can gate.
"""

from __future__ import annotations

import os
import shutil
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "empty_tables")
SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def build_empty() -> None:
    import duckdb

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet' LIMIT 0) "
            f"TO '{SCRATCH}/{t}.parquet' (FORMAT PARQUET)"
        )


def main() -> int:
    only = set(sys.argv[1:])
    build_empty()

    from market_data_pipeline_spark.session import get_spark
    from market_data_pipeline_spark.plans.driver_queries import QUERIES

    spark = get_spark("empty-sweep", shuffle_partitions=4)
    crashes = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            n = len(fn(spark, SCRATCH).collect())
            print(f"ok    {name}: {n} rows")
        except Exception as e:
            crashes.append(name)
            first = traceback.format_exc().strip()[-2000:]
            print(f"CRASH {name}: {first}")
    print(f"\n{len(crashes)} crash(es)" + (f": {crashes}" if crashes else ""))
    return 1 if crashes else 0


if __name__ == "__main__":
    raise SystemExit(main())
