r"""Degenerate-embedding engine-parity sweep: clone sf0.001 with
adversarial vectors injected into embeddings.embedding — every 9th
vector all-zero (zero-norm cosine probes), every 15th an exact
duplicate of vec_id 0's vector (similarity ties + dedup multiplicity),
every 21st with a single huge component (1e6, magnitude probes) — then
run every oracled query whose oracle reads `embeddings` on Spark AND
DuckDB over the SAME tables and compare with the gate's compare().

Motivation: zero-norm guards (try_divide / where-nonzero) were added
piecemeal as individual properties found crashes (k23 round 6, dd5
round 4); this sweeps the whole embedding-reading surface at once.
Rows-only embedding queries (LSH, PQ, kmeans) get a crash-only check.

Usage: python scripts/zerovec_sweep.py [query ...]
Exit 1 on any divergence or crash.
"""

from __future__ import annotations

import os
import shutil
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "zerovec_tables")
SRC = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def build_zerovec() -> None:
    import duckdb

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        if t == "embeddings":
            con.execute(
                f"""COPY (
  WITH base AS (SELECT * FROM '{SRC}/embeddings.parquet'),
  anchor AS (SELECT embedding AS a FROM base WHERE vec_id = 0)
  SELECT vec_id,
         CASE
           WHEN vec_id > 0 AND vec_id % 9 = 0
             THEN CAST(list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                       AS FLOAT[])
           WHEN vec_id > 0 AND vec_id % 15 = 0 THEN (SELECT a FROM anchor)
           WHEN vec_id > 0 AND vec_id % 21 = 0
             THEN CAST(list_append(embedding[1:len(embedding)-1],
                                   CAST(1e6 AS FLOAT)) AS FLOAT[])
           ELSE embedding END AS embedding,
         label
  FROM base
) TO '{SCRATCH}/embeddings.parquet' (FORMAT PARQUET)"""
            )
        else:
            shutil.copy(f"{SRC}/{t}.parquet", f"{SCRATCH}/{t}.parquet")


def main() -> int:
    import duckdb

    only = set(sys.argv[1:])
    build_zerovec()

    from market_data_pipeline_spark.session import get_spark
    from __spark_entry__ import oracle_sql, queries
    from check_oracle import compare

    spark = get_spark("zerovec-sweep", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SCRATCH}/{t}.parquet'")

    # rows-only queries that consume the embeddings table (crash-only
    # check — no oracle to diverge from): the ANN/LSH/PQ/PCA family
    ROWS_ONLY_EMB = {
        "k3_knn_lsh", "k5_knn_ivf_kmeans", "k7_knn_pq", "k12_mmr_diverse",
        "k18_text_ann_end_to_end", "k21_pca_variance",
        "dd6_cosine_near_dup_lsh",
    }

    qs, oras = queries(), oracle_sql()
    failures, warns = [], []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oras:
            if name not in ROWS_ONLY_EMB:
                continue
            try:
                fn(spark, SCRATCH).collect()
                print(f"skip  {name}: rows-only (no crash)")
            except Exception:
                failures.append((name, "rows-only CRASH on degenerate vectors"))
                tb = traceback.format_exc().strip().splitlines()[-1][:160]
                print(f"FAIL  {name}: rows-only crash {tb}")
            continue
        if "embeddings" not in oras[name]:
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
            print(f"WARN  {name}: two-sided empty under degenerate vectors")
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
