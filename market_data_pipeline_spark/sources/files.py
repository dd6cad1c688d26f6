"""File-format sources/sinks beyond parquet: CSV, JSON-lines, ORC.

The reference's only interchange formats are parquet backups and staged
CSV (SURVEY §2.1 S5/S9, reference: src/setup/setup_clickhouse.py:122-245);
a lake ingest layer additionally meets CSV drops and JSONL event feeds
from upstream producers. Conventions that matter at scale:

- **Always an explicit schema.** Inference scans the data once just to
  guess types (a full extra pass at 100 TB) and guesses differently on
  different samples; the schema IS the contract.
- **PERMISSIVE + quarantine, never abort.** One malformed line in a
  terabyte feed must not kill the job: bad records land in
  ``_corrupt_record`` and are split into a quarantine frame for
  inspection/replay, clean rows flow on. The parse runs as
  ``from_json``/``from_csv`` over a text scan — same single distributed
  pass as the native readers, but the corrupt column is an ordinary
  projected column, so quarantine-only queries plan fine (the native
  readers refuse plans that touch only ``_corrupt_record``,
  UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN).
- **Writers mirror readers** so every format round-trips losslessly
  (asserted in tests) — the same DataFrame contract as the parquet
  tables, only the encoding differs.

Known limit: the line-based CSV path does not support quoted embedded
newlines (neither does any splittable CSV read — multiline CSV forces
one task per file in the native reader too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType([*schema.fields, T.StructField(CORRUPT_COL, T.StringType())])


def _split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    clean = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, quarantine


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines with an explicit schema, PERMISSIVE.

    Returns (clean, quarantine): rows that failed to parse (or violated
    the schema) arrive in the quarantine frame — the partially-parsed row
    plus the raw line in ``_corrupt_record`` — while clean rows have the
    corrupt column dropped.
    """
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            _with_corrupt(schema),
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_r")
    ).select("_r.*")
    return _split(parsed)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV with explicit schema, PERMISSIVE + quarantine (see read_jsonl).
    The reference's CSV staging loads (S9) map here, minus the manual
    1000-row pagination — the text scan splits by byte ranges on its own.
    With ``header=True`` the header line (reconstructed from the schema —
    the schema is the contract, the header is decoration) is dropped
    wherever it appears, which also handles concatenated part-files each
    carrying their own header."""
    raw = spark.read.text(path)
    if header:
        header_line = sep.join(f.name for f in schema.fields)
        raw = raw.filter(F.col("value") != header_line)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in _with_corrupt(schema).fields
    )
    parsed = raw.select(
        F.from_csv(
            F.col("value"),
            ddl,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL, "sep": sep},
        ).alias("_r")
    ).select("_r.*")
    return _split(parsed)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan (schema from file footers, same pushdown/pruning rules as
    parquet — both are columnar with row-group statistics)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)
