"""The straggler measurement skew_bench could not show at sf0.1 (its
hot key fits one task): per-user WINDOW operators on a 10x events
frame (10M rows) where ~50% of rows belong to ONE user — the partition
AQE cannot split (skew-join splitting applies to joins, not windows).

Builds two frames from the §G 10x/100x scratch recipe's events table:
  uniform10x: the scale_rehearsal_g events recipe at 10 copies
  skew10x:    same rows, user_id remapped so event_id%2==0 -> hot user

Measures e3_sessionize / e14_sliding_active_users / e11_rfm_scores and
skw2's salted aggregation on both, best-of-2 noop-write. The expected
result IS the straggler: one task owns a 5M-row session window — and
(round 9) skw3_sharded_sessions is the in-repo fix: its (user, shard)
window bounds any task at the hot entity's per-shard rows, so its
skew/uniform ratio should stay ~flat where e3's shows the slope.
That pairing justifies (a) skw1's pre-flight audit, (b) the
cap_hot_entities ingest policy, and (c) sessionize_sharded as the
exact-semantics path — salting cannot preserve sessionization order.

Usage: python scripts/skew_straggler_10x.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
SCRATCH = os.path.join(REPO, ".scratch", "skew_straggler")
QUERIES_S = ["e3_sessionize", "skw3_sharded_sessions",
             "e14_sliding_active_users", "e11_rfm_scores",
             "skw2_salted_user_totals"]


def build() -> None:
    import duckdb

    shutil.rmtree(SCRATCH, ignore_errors=True)
    for sub in ("uniform", "skew"):
        os.makedirs(f"{SCRATCH}/{sub}", exist_ok=True)
    con = duckdb.connect()
    copies = " UNION ALL ".join(
        f"SELECT event_id + {i}::BIGINT*100000000 AS event_id, "
        f"ts + {i} * INTERVAL 35 DAY AS ts, "
        f"user_id + {i}::BIGINT*10000000 AS user_id, event_type, value, props "
        f"FROM '{SRC}/events.parquet'"
        for i in range(10)
    )
    con.execute(
        f"COPY ({copies}) TO '{SCRATCH}/uniform/events.parquet' (FORMAT PARQUET)"
    )
    hot = con.execute(
        f"SELECT MIN(user_id) FROM '{SCRATCH}/uniform/events.parquet'"
    ).fetchone()[0]
    con.execute(
        f"COPY (SELECT event_id, ts, "
        f"CASE WHEN event_id % 2 = 0 THEN {hot} ELSE user_id END AS user_id, "
        f"event_type, value, props FROM '{SCRATCH}/uniform/events.parquet') "
        f"TO '{SCRATCH}/skew/events.parquet' (FORMAT PARQUET)"
    )
    for t in ("region nation customer supplier part orders lineitem "
              "documents embeddings").split():
        for sub in ("uniform", "skew"):
            shutil.copy(f"{SRC}/{t}.parquet", f"{SCRATCH}/{sub}/{t}.parquet")
    for sub in ("uniform", "skew"):
        n = con.execute(
            f"SELECT COUNT(*), COUNT(DISTINCT user_id) FROM '{SCRATCH}/{sub}/events.parquet'"
        ).fetchone()
        print(f"  {sub}: {n[0]} rows, {n[1]} users", file=sys.stderr)


def main() -> int:
    from market_data_pipeline_spark.plans.driver_queries import QUERIES
    from market_data_pipeline_spark.session import get_spark

    if not os.path.exists(f"{SCRATCH}/skew/events.parquet"):
        build()
    spark = get_spark("skew-straggler")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    print("| query | uniform 10x (s) | skew 10x (s) | ratio |")
    print("|---|---|---|---|")
    for name in QUERIES_S:
        fn = QUERIES[name]
        t = {}
        for sub in ("uniform", "skew"):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, f"{SCRATCH}/{sub}").write.mode("overwrite").format(
                    "noop"
                ).save()
                best = min(best, time.perf_counter() - t0)
            t[sub] = best
        print(
            f"| {name} | {t['uniform']:.2f} | {t['skew']:.2f} | "
            f"{t['skew'] / t['uniform']:.2f}x |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
