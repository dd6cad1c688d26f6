"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count, column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]

Degenerate-empty guard (r6 verdict #2): a PASS where BOTH sides return
0 rows is vacuous — it proved only that two empty sets are equal, not
that the query computes anything. Round 6 shipped two such drafts
(a26_new_highs_lows with an unfillable 60-obs window, tx36_readability
on a terminator-less corpus) that "passed" until an eyeball caught the
row counts. The gate now FAILS a 0-row two-sided match unless the query
is explicitly whitelisted in MAY_BE_EMPTY, and always prints row counts
on PASS. Rows-only queries get the same treatment (0 rows -> FAIL).
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from market_data_pipeline_spark.session import get_spark  # noqa: E402
from __spark_entry__ import oracle_sql, queries  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Queries whose EMPTY result is a meaningful, intended answer at sf0.01
# (invariant checks that hold, reconciliations with no discrepancies).
# Every entry needs a one-line justification; anything else returning
# 0 rows on both sides is a degenerate pass and FAILS the gate.
MAY_BE_EMPTY: dict[str, str] = {
    # (currently empty: at sf0.01 every registered query returns >=1 row;
    #  violation-shaped queries emit per-group counts, not bare rows)
}


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def compare(name, spark_cols, srows, duck_cols, drows):
    """The gate's comparison, factored out so tests can drive it.

    Returns (status, message) where status is "PASS" or "FAIL". The
    degenerate-empty guard lives HERE so the regression test exercises
    the same code path the gate runs.
    """
    if sorted(spark_cols) != sorted(duck_cols):
        return "FAIL", f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}"
    if len(srows) != len(drows):
        return "FAIL", f"rowcount {len(srows)} vs {len(drows)}"
    if not srows and not drows:
        if name in MAY_BE_EMPTY:
            return "PASS", f"0 rows (whitelisted empty: {MAY_BE_EMPTY[name]})"
        return "FAIL", (
            "degenerate 0-row two-sided match — a vacuous pass; add to "
            "MAY_BE_EMPTY with a justification if genuinely intended"
        )
    cols = sorted(spark_cols)
    skey = sorted(tuple(str(norm(r[c])) for c in cols) for r in srows)
    dkey = sorted(tuple(str(norm(r[c])) for c in cols) for r in drows)
    if skey != dkey:
        ndiff = len([1 for a, b in zip(skey, dkey) if a != b])
        diff = [(a, b) for a, b in zip(skey, dkey) if a != b][:3]
        return "FAIL", f"values differ ({ndiff} rows), e.g. {diff}"
    return "PASS", f"{len(srows)} rows"


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, oras = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf)
            spark_cols = list(sdf.columns)
            srows = [row.asDict() for row in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {e}")
            continue
        if name not in oras:
            if not srows and name not in MAY_BE_EMPTY:
                failures.append((name, "rows-only query returned 0 rows"))
                print(f"FAIL {name}: rows-only returned 0 rows (degenerate)")
            else:
                print(f"ok   {name}: rows-only ({len(srows)} rows, cols={sorted(spark_cols)})")
            continue
        try:
            ddf = con.execute(oras[name]).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {e}")
            continue
        status, msg = compare(name, spark_cols, srows, ddf.column_names, ddf.to_pylist())
        if status == "FAIL":
            failures.append((name, msg))
        print(f"{status} {name}: {msg}" if status == "FAIL" else f"PASS {name} ({msg})")
    print(f"\n{len(failures)} failures" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
