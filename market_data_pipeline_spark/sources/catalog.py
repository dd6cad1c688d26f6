"""Parquet catalog over the driver's synthetic tables (TESTDATA.md).

Replaces the reference's ClickHouse query bridge
(reference: src/clickhouse/client.py:23-71): where the reference POSTs SQL
text over HTTP and re-hydrates JSON rows into Polars, here ``spark.read``
returns the DataFrame directly and Catalyst owns the plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ensure_session_defaults(spark: SparkSession) -> None:
    """Runtime SQL confs our query semantics depend on, set defensively
    for externally-built sessions (the driver's verify may construct its
    own SparkSession rather than ours):

    - UTC session timezone — every date/timestamp result is hash-compared
      against DuckDB, which evaluates in UTC; a local-TZ session would
      silently shift epoch-derived values.
    - nanosAsLong — events.ts is parquet TIMESTAMP(NANOS), unreadable
      otherwise.

    Both are runtime-settable; failures are swallowed (a locked-down conf
    just leaves the session as-is).

    Deliberately NOT memoized (r12 probe): the per-call cost is two
    ~0.3ms py4j round-trips, and the session-contract tests
    (tests/test_session_contract.py) REQUIRE that every entry path
    re-pins a session whose zone was flipped mid-session — a one-shot
    memo breaks that designed hostile-session recovery for a negligible
    saving.
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        # r12 optimization: PySpark 4's per-DataFrame-method call-site
        # capture costs ~3-4 py4j round trips per wrapped call at plan
        # build. Semantics-free (error-message context only). Only
        # effective for externally-built sessions when set before the
        # process's first wrapped call (pyspark caches the flag
        # module-wide); our own factory sets it at build.
        ("spark.python.sql.dataFrameDebugging.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass


def ping(spark: SparkSession) -> bool:
    """Session liveness check — the ``clickhouse_client.ping()`` the
    reference calls but never defined (reference:
    scripts/sync_new_listings.py:183, SURVEY §0 drift list). True iff the
    session can execute a trivial query end-to-end."""
    try:
        return spark.sql("SELECT 1 AS ok").collect()[0]["ok"] == 1
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table. Schema comes from the parquet footer — the
    files are the contract (FIXTURES.md §B); we do not re-impose StructTypes
    on read, so predicate pushdown and column pruning reach the scan.

    The footer-derived schema is memoized per (session, file, stat):
    schema INFERENCE costs ~100ms of driver-side listing + footer work
    per ``spark.read.parquet`` call, vs ~16ms for a schema-supplied read
    (measured r12, guide §1.2/§6 — plan-build fixed cost, paid inside
    every timed query). The cached value is exactly the schema inference
    would return (same footer, same session confs — ensure_session_defaults
    pins the one conf that affects it, ``nanosAsLong``), so plans, pushdown
    and results are identical; only the repeated footer re-read is
    skipped. The cache key carries (mtime_ns, size), so a rewritten file
    re-infers — and it holds SCHEMAS, never data or results. At scale
    this role is played by a metastore/table-format catalog, which is
    precisely a persisted schema cache.

    ``events.ts`` is normalized by :func:`normalize_event_ts`, which
    handles both on-disk encodings the driver has produced: parquet
    TIMESTAMP(NANOS) read as bigint under ``nanosAsLong`` (converted by
    lossless integer ns->µs division) and TIMESTAMP(MICROS, non-UTC) read
    as TIMESTAMP_NTZ (cast to instant under the UTC session)."""
    ensure_session_defaults(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = read_parquet_cached_schema(spark, path)
    if name == "events":
        # the normalization plan is a pure function of the relation
        # (same session, same file version -> same lazy plan); memoize it
        # next to the relation so the ~100 event-family queries skip the
        # dtypes probe + withColumn round trips per call (r12, guide §1.2)
        hit = _NORM_CACHE.get((spark, path))
        if hit is not None and hit[1] is df:
            return hit[0]
        norm = normalize_event_ts(df)
        _NORM_CACHE[(spark, path)] = (norm, df)
        return norm
    return df


# (session, path) -> (stat_key, DataFrame). Bounded: one entry per distinct
# driver table file per session; stale keys (old stat) are evicted on the
# miss that replaces them; entries of stopped sessions are purged before
# every lookup (the frame-cache pattern from plans.driver_queries).
_SCHEMA_CACHE: dict = {}
# (session, path) -> (normalized events DataFrame, the relation it wraps).
# Validated by relation IDENTITY against _SCHEMA_CACHE's current entry, so
# a re-resolved file version (new relation object) re-normalizes.
_NORM_CACHE: dict = {}


def _purge_dead_sessions(cache: dict) -> None:
    for key in list(cache):
        sess = key[0]
        try:
            dead = sess.sparkContext._jsc is None
        except Exception:
            dead = True
        if dead:
            del cache[key]


def read_parquet_cached_schema(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet(path)`` with the resolved relation memoized
    per (session, file-version).

    First read of a (session, file-version) infers exactly as before and
    keeps the resulting DataFrame; later reads of the SAME file version
    return it directly, skipping the per-call footer/listing/relation
    work (~19ms even schema-supplied — r12 measured; guide §1.2). The
    DataFrame is an immutable logical plan rooted at the parquet scan:
    sharing the relation node never defeats per-query column pruning or
    pushdown (each query plans its own scan on top), and NO data or
    results are cached — execution re-reads the parquet every time.
    Missing files raise the same error on the inference path; a changed
    file (different (mtime_ns, size) stat — every ParquetTable mutation
    touches the directory: overwrite/restore rename it, appends and
    partition rewrites create/remove entries in it) re-resolves."""
    try:
        st = os.stat(path)
        stat_key = (st.st_mtime_ns, st.st_size)
    except OSError:
        # nonexistent / raced path: fall through to the plain reader so
        # the error surfaces exactly as before
        return spark.read.parquet(path)
    _purge_dead_sessions(_SCHEMA_CACHE)
    _purge_dead_sessions(_NORM_CACHE)
    key = (spark, path)
    hit = _SCHEMA_CACHE.get(key)
    if hit is not None and hit[0] == stat_key:
        return hit[1]
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[key] = (stat_key, df)
    return df


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a plain (UTC-instant) TIMESTAMP whatever
    the parquet stored: TIMESTAMP(NANOS) reads as bigint under nanosAsLong,
    TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as TIMESTAMP_NTZ. The
    session timezone is pinned to UTC, so the NTZ->TZ cast preserves the
    wallclock values DuckDB hashes; watermarks/windows require TIMESTAMP."""
    dtype = dict(df.dtypes).get("ts")
    if dtype == "bigint":
        # integer div, not float: double division rounds the ns value and
        # shifts some timestamps by 1µs
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dtype == "timestamp_ntz":
        # The NTZ->TZ cast reinterprets wallclock in the SESSION timezone.
        # ensure_session_defaults pins it to UTC but swallows conf-set
        # failures (locked-down session), which would silently shift every
        # timestamp here — so verify, and convert through an explicit-TZ
        # expression when the session isn't UTC instead of trusting the
        # cast.
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz in ("UTC", "Etc/UTC", "GMT"):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        else:
            # The cast interpreted wallclock W in session tz X, yielding
            # instant W - offset(X); from_utc_timestamp adds offset(X) back
            # so the stored wallclock is preserved as a UTC instant.
            # (to_utc_timestamp would subtract it AGAIN -> W - 2*offset.)
            df = df.withColumn(
                "ts", F.from_utc_timestamp(F.col("ts").cast("timestamp"), tz)
            )
    return df


class Catalog:
    """Lazy handle bundle for one scale-factor directory.

    Each property returns a fresh DataFrame rooted at the parquet scan, so
    every query builds its own pruned scan (no shared cached plan that would
    defeat column pruning).
    """

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLE_NAMES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register all tables as temp views for spark.sql access
        (reference views analog: src/setup/setup_clickhouse.py:247-295)."""
        for name in TABLE_NAMES:
            self.table(name).createOrReplaceTempView(name)
