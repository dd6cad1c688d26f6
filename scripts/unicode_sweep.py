r"""Unicode-text engine-parity sweep: clone sf0.001 with adversarial
Unicode injected into documents.text (NBSP, ideographic space, line/
paragraph separators, accents, CJK, emoji+ZWJ, Turkish dotted I, German
sharp s), then run every oracled query whose oracle reads `documents`
on Spark AND DuckDB over the SAME tables and compare with the gate's
compare().

Motivation: the repo tokenizes in three engines — JVM ``F.split`` and
DuckDB ``string_split_regex`` both use ASCII ``\s`` (RE2 / Java
default), but Python ``re`` treats ``\s`` as UNICODE whitespace (NBSP,
U+2028, U+3000 all match) — so any Arrow-batched Python tokenizer that
claims oracle-identical tokenization silently diverges on the first
non-ASCII space. ``lower()`` has its own cross-engine hazards (Turkish
dotted I). The shipped testdata is ASCII, so the per-round gate can
never catch this class.

Every 11th document gets a deterministic adversarial suffix
(NBSP-joined accents, CJK, emoji ZWJ sequence, ideographic space,
sharp s, LINE/PARAGRAPH SEPARATOR, tab, full-width digits, TRAILING
NBSP); every 23rd additionally has its inner spaces swapped for NBSP.

KNOWN ENGINE DIVERGENCE (probed, then excluded from the gating
corpus): lower('\u0130' Turkish dotted capital I) is 'i\u0307'
(i + COMBINING DOT ABOVE — the Unicode-correct full lowercase) in
both Spark's UTF8String and Python str.lower, but plain 'i' in
DuckDB. The product stack is self-consistent; only the DuckDB
ORACLE diverges, and only on that character, so it cannot gate.
Verified 2026-08-15: with \u0130 in the suffix exactly the
lowercasing queries (tx4/tx5/tx16/tx17/tx26/f15/ck1/dd13) flag,
all on the i\u0307-vs-i delta; with it removed they pass.

Usage: python scripts/unicode_sweep.py [query ...]
Exit 1 on any divergence or crash.
"""

from __future__ import annotations

import os
import shutil
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "unicode_tables")
SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# All escaped explicitly so the adversary is auditable:
# NBSP-joined accents, CJK, woman-technologist emoji (ZWJ sequence),
# ideographic space, Turkish dotted I, sharp s, LINE SEPARATOR,
# PARAGRAPH SEPARATOR, full-width digits.
NBSP = " "
SUFFIX = (
    " caf\u00e9\u00a0na\u00efve \u4e2d\u6587\u5206\u8bcd"
    " \U0001f469\u200d\U0001f4bb \u3000Istanbul stra\u00dfe"
    " line\u2028sep para\u2029sep tab\there \uff11\uff12\u00a0"
    # VERTICAL TAB (\x0B): inside Java's ASCII \s but outside RE2's —
    # r9 ADVICE #1 moved every tokenizer to the explicit class
    # [ \t\n\x0B\f\r]+ and this token pins that the engines agree on it
    " vt\x0Bsplit"
)


def build_unicode() -> None:
    import duckdb

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (
  WITH adv AS (
    SELECT doc_id,
           CASE
             WHEN doc_id % 23 = 0 THEN replace(text, ' ', ?) || ?
             WHEN doc_id % 11 = 0 THEN text || ?
             ELSE text END AS text,
           lang, source
    FROM '{SRC}/documents.parquet'
  )
  SELECT doc_id, text, lang, source, length(text) AS n_chars FROM adv
) TO '{SCRATCH}/documents.parquet' (FORMAT PARQUET)""",
                [NBSP, SUFFIX, SUFFIX],
            )
        else:
            shutil.copy(f"{SRC}/{t}.parquet", f"{SCRATCH}/{t}.parquet")


def main() -> int:
    import duckdb

    only = set(sys.argv[1:])
    build_unicode()

    from market_data_pipeline_spark.session import get_spark
    from __spark_entry__ import oracle_sql, queries
    from check_oracle import compare

    spark = get_spark("unicode-sweep", shuffle_partitions=8)
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
        if "documents" not in oras[name]:
            continue  # text untouched -> parity already covered by the gate
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
            print(f"WARN  {name}: two-sided empty under unicode input")
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
