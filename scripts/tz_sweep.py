"""Session-timezone adversary sweep (r7 verdict #4): run the oracled
query surface with every timezone knob an operator could plausibly set
to a non-UTC DST zone — JVM default tz, python TZ, the session
``spark.sql.session.timeZone`` at session creation, DuckDB's TimeZone —
and compare engine-vs-oracle with the gate's own compare().

What this proves: the engine's date/window results are DEPLOYMENT-
ENVIRONMENT IMMUNE. The tz-sensitive class (date_trunc / window /
to_date / hour over the TIMESTAMP column events.ts) consults the
session timezone at EXECUTION; the engine pins UTC at its catalog
boundary (sources.catalog.ensure_session_defaults, called by every
load_table), so a user session created under America/New_York still
buckets identically to the UTC-wall oracle. All date-typed columns
(trade_date etc.) are tz-free by type.

--hostile mode: re-pins the session to America/New_York AFTER each
DataFrame is built (defeating the catalog pin) and INVENTORIES which
queries' executions are tz-sensitive. That mode is report-only (exit 0):
an execution-time zone flip mid-query violates the engine's documented
session contract, and the only principled fix — migrating events.ts to
TIMESTAMP_NTZ — changes the public schema; the inventory documents the
boundary instead (BENCHNOTES round-8 entry).

America/New_York is chosen for DST: its -05:00/-04:00 flips land inside
the events table's date span, so day/hour bucketing actually moves.

Usage: python scripts/tz_sweep.py [--hostile] [query ...]
Exit 1 on any divergence in normal mode; hostile mode always exits 0.
"""

from __future__ import annotations

import datetime as _dt
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
TZ = "America/New_York"


def _utc_naive(rows: list[dict], ltz_cols: set[str]) -> list[dict]:
    """PySpark's plain collect() renders TimestampType (LTZ) instants as
    naive datetimes in the PYTHON PROCESS'S local zone — standard
    PySpark behavior, not an engine defect (the engine's real sink,
    parquet, stores tz-immune µs instants; the driver gate's container
    runs UTC so its comparisons never see this). Under this sweep's
    non-UTC process zone the rendering shifts, so re-render LTZ columns
    in UTC to match the oracle's naive-UTC convention before hashing.
    TIMESTAMP_NTZ and DATE columns are wall values — already zone-free,
    MUST NOT be shifted (orders dates collect as NTZ). (The one
    ambiguous wall-hour per DST fall-back resolves via fold=0; the
    testdata has no rows there.)"""
    out = []
    for r in rows:
        fixed = {}
        for k, v in r.items():
            if (
                k in ltz_cols
                and isinstance(v, _dt.datetime)
                and v.tzinfo is None
            ):
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            fixed[k] = v
        out.append(fixed)
    return out


def main() -> int:
    # set the process + JVM default zones BEFORE any spark import so the
    # driver JVM actually launches under the adversarial zone
    os.environ["TZ"] = TZ
    time.tzset()

    import duckdb

    args = sys.argv[1:]
    hostile = "--hostile" in args
    only = {a for a in args if not a.startswith("--")}

    from market_data_pipeline_spark.session import get_spark
    from __spark_entry__ import oracle_sql, queries
    from check_oracle import compare  # same comparator the gate runs

    spark = get_spark(
        "tz-sweep",
        shuffle_partitions=8,
        extra_conf={
            # what a non-UTC cluster would hand the engine
            "spark.sql.session.timeZone": TZ,
            "spark.driver.extraJavaOptions": f"-Duser.timezone={TZ}",
        },
    )
    con = duckdb.connect()
    con.execute(f"SET TimeZone='{TZ}'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SRC}/{t}.parquet'")

    qs, oras = queries(), oracle_sql()
    failures, warns, sensitive = [], [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oras:
            continue  # rows-only: nothing to diverge from here
        try:
            # hand the engine a non-UTC session every time; the catalog
            # boundary is responsible for re-pinning UTC
            spark.conf.set("spark.sql.session.timeZone", TZ)
            sdf = fn(spark, SRC)
            if hostile:
                # defeat the catalog pin between build and execution
                spark.conf.set("spark.sql.session.timeZone", TZ)
            spark_cols = list(sdf.columns)
            from pyspark.sql.types import TimestampType

            ltz = {
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, TimestampType)
            }
            srows = _utc_naive([row.asDict() for row in sdf.collect()], ltz)
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
            print(f"WARN  {name}: two-sided empty")
        elif status == "FAIL":
            if hostile:
                sensitive.append(name)
                print(f"tz-sensitive  {name}: {msg[:160]}")
            else:
                failures.append((name, msg))
                print(f"FAIL  {name}: {msg[:300]}")
        else:
            print(f"ok    {name}: {msg}")

    if hostile:
        print(
            f"\nhostile-mode inventory: {len(sensitive)} execution-tz-sensitive "
            f"quer{'y' if len(sensitive) == 1 else 'ies'}: {sorted(sensitive)}"
        )
        print(f"{len(failures)} crash(es)/oracle error(s)")
        return 1 if failures else 0
    print(f"\n{len(failures)} divergence(s), {len(warns)} empty-warn(s)")
    for n, m in failures:
        print(f"  DIVERGE {n}: {m[:200]}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    raise SystemExit(main())
