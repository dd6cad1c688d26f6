"""Order-of-magnitude scale rehearsal for the top-10 most expensive
queries (r6 verdict #5 / SCALE.md §G).

All value evidence tops out at sf0.1 (~600k lineitem rows); the 100 TB
claims otherwise rest on plan-shape arguments. This builds a ~10x frame
from sf0.1 with DuckDB and measures the ten most expensive registry
queries at both scales with bench.py's exact materialization (noop
write, best-of-2), reporting the time ratio next to the 10x data ratio.

Scaling recipe (per copy i in 0..9; copy 0 is sf0.1 verbatim):
- lineitem/orders: keys offset by i*10M (referential integrity kept per
  copy), dates shifted by i*2557 days so the per-symbol series really
  get 10x LONGER (an overlapping-dates union would collapse back into
  the same (symbol, day) grid after price aggregation). l_partkey is
  NOT offset: same symbol universe, 10x history each — the axis
  per-series windows actually grow on.
- supplier/customer: keys offset (i*100k / i*1M); supplier names get a
  per-copy word prefix so name-similarity structure repeats 10x without
  creating giant cross-copy near-dup clusters.
- events: user/event ids offset, ts shifted by i*35 days — 10x users,
  10x edges; PageRank gets 10 disjoint subgraphs of the original size.
- documents: doc_id offset; every WORD gets a per-copy prefix (a
  bijective token rename) — shingle/vocab structure within each copy is
  EXACTLY the original corpus's, cross-copy similarity is zero, so the
  dedup workload is a true 10x of the sf0.1 problem (a verbatim 10x
  copy would instead densify every duplicate cluster ~45x). Vocabulary
  grows 10x, which is what the BPE trainer and hashed-ANN paths should
  see from a 10x corpus anyway.
- part/nation/region verbatim (dimension tables).

Usage: python scripts/scale_rehearsal_g.py [--copies 10] [--skip-build]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "scale10")
SRC = "/root/testdata/sf0.1"

QUERIES_G = [
    "k18_text_ann_end_to_end",
    "pipeline1_daily_update",
    "ts38_rank_churn",
    "e24_event_pagerank",
    "dd7_dup_clusters",
    "dd8_capped_dedup_corpus",
    "tx29_bpe_merges",
    "j14_sourcing_entropy",
    "r9_pareto_symbols",
    "ts31_streaks",
]


def build_scratch(copies: int) -> None:
    import duckdb

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    con = duckdb.connect()

    def write(table: str, union_sql: str) -> None:
        con.execute(
            f"COPY ({union_sql}) TO '{SCRATCH}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{SCRATCH}/{table}.parquet'"
        ).fetchone()[0]
        print(f"  built {table}: {n} rows")

    def copies_union(per_copy_sql: str) -> str:
        return " UNION ALL ".join(
            per_copy_sql.format(i=i) for i in range(copies)
        )

    li = f"'{SRC}/lineitem.parquet'"
    write("lineitem", copies_union(
        f"SELECT l_orderkey + {{i}}::BIGINT*10000000 AS l_orderkey, l_partkey, "
        f"l_suppkey + {{i}}::BIGINT*100000 AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate + {{i}} * INTERVAL 2557 DAY AS l_shipdate FROM {li}"
    ))
    write("orders", copies_union(
        f"SELECT o_orderkey + {{i}}::BIGINT*10000000 AS o_orderkey, "
        f"o_custkey + {{i}}::BIGINT*1000000 AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate + {{i}} * INTERVAL 2557 DAY AS o_orderdate, "
        f"o_orderpriority FROM '{SRC}/orders.parquet'"
    ))
    write("supplier", copies_union(
        f"SELECT s_suppkey + {{i}}::BIGINT*100000 AS s_suppkey, "
        f"CASE WHEN {{i}} = 0 THEN s_name ELSE "
        f"array_to_string(list_transform(string_split(s_name, ' '), "
        f"w -> 'c{{i}}' || w), ' ') END AS s_name, "
        f"s_nationkey, s_acctbal FROM '{SRC}/supplier.parquet'"
    ))
    write("customer", copies_union(
        f"SELECT c_custkey + {{i}}::BIGINT*1000000 AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'"
    ))
    write("events", copies_union(
        f"SELECT event_id + {{i}}::BIGINT*100000000 AS event_id, "
        f"ts + {{i}} * INTERVAL 35 DAY AS ts, "
        f"user_id + {{i}}::BIGINT*10000000 AS user_id, event_type, value, props "
        f"FROM '{SRC}/events.parquet'"
    ))
    write("documents", copies_union(
        f"SELECT doc_id + {{i}}::BIGINT*10000000 AS doc_id, "
        f"CASE WHEN {{i}} = 0 THEN text ELSE "
        f"array_to_string(list_transform(string_split(text, ' '), "
        f"w -> 'c{{i}}' || w), ' ') END AS text, "
        f"lang, source, "
        f"CASE WHEN {{i}} = 0 THEN n_chars ELSE length("
        f"array_to_string(list_transform(string_split(text, ' '), "
        f"w -> 'c{{i}}' || w), ' ')) END AS n_chars "
        f"FROM '{SRC}/documents.parquet'"
    ))
    for t in ("part", "nation", "region", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{SCRATCH}/{t}.parquet")
        print(f"  copied {t} verbatim")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("queries", nargs="*", help="subset of QUERIES_G "
                    "(r7 verdict #5: the 100x pass runs only the three "
                    "steepest 10x entries)")
    args = ap.parse_args()

    if not args.skip_build:
        print(f"== building {args.copies}x scratch at {SCRATCH}")
        t0 = time.perf_counter()
        build_scratch(args.copies)
        print(f"  build: {time.perf_counter() - t0:.1f}s")

    from market_data_pipeline_spark.session import get_spark
    from market_data_pipeline_spark.plans.driver_queries import QUERIES

    spark = get_spark("scale-rehearsal-g")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm the JVM

    results = {}
    label_big = f"x{args.copies}"
    for name in (args.queries or QUERIES_G):
        fn = QUERIES[name]
        row = {}
        for label, sf_dir in (("sf0.1", SRC), (label_big, SCRATCH)):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 2)
            import gc

            gc.collect()
        row["ratio"] = (
            round(row[label_big] / row["sf0.1"], 1) if row["sf0.1"] else None
        )
        results[name] = row
        print(f"{name}: sf0.1={row['sf0.1']}s  {label_big}={row[label_big]}s  "
              f"ratio={row['ratio']}x")

    print("\n" + json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
