"""100x rehearsal for pipeline3's two-day idempotence run (r9 verdict #4).

pipeline3 is the registry's single most expensive query (10.4s at
sf0.1) and was the only §3 composition with no scale rehearsal (§G
covered pipeline1 at 10x only). This runs the same composition —
`run_daily_update` TWICE against one master (day 2 is the idempotence
re-run) — at the sf0.1 input scale (16.4k symbols) and at the LARGEST
scale the product's own domain admits, with crawl-shaped inputs
generated from spark.range in the exact `_daily_update_inputs` shapes
(format-rotating dates, Korean number fields, every 7th supplier
delisting).

DOMAIN CEILING (found by this rehearsal's first run): the verdict's
"100x = 1.6M symbols" is unreachable — `symbol_rule` enforces the
reference's 6-digit KRX symbol contract
(scripts/sync_delisted_stocks.py:63-67), so validation structurally
caps a master at < 1M rows (the first attempt silently validated away
700k over-domain symbols, and the 4e5-offset new-listing space
collided with a 1.5M-wide KOSDAQ space). The big scale is therefore
the DOMAIN MAXIMUM: 100k KOSPI + 700k KOSDAQ + 40k KONEX = 840k
symbols (~51x inputs), disjoint 6-digit ranges. Consequence worth
recording: the master table itself can never be the 100 TB problem —
its ceiling is ~1M rows by contract; the scale risk lives (and is
rehearsed) in the fact tables.

Measured per scale: day-1 wall (bootstrap + upserts + delist + compact),
day-2 wall (the idempotent re-run), report wall. Asserted per scale, not
just timed: day 2 inserts NOTHING (listed and new-listing upserts both
0), the scalar stats match across days, and the full PER-MARKET report
after day 2 equals the one after day 1 (a redistribution between
markets would slip past the scalar totals).

The design claim under test: pipeline cost = a fixed number of small
storage jobs (measured ~0.9x at 10x for pipeline1, i.e. pure scheduling
overhead at that size) + per-job terms linear in master rows. Any
superlinear storage term (e.g. compaction rewriting more than the
touched bytes, anti-joins degrading past broadcast) shows up here as an
exponent > 1.

Usage: python scripts/pipeline3_100x.py
"""

from __future__ import annotations

import datetime as dt
import math
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.path.join(REPO, ".scratch", "pipeline3_100x")


def crawl_inputs(spark, n_sup: int, n_cust: int, n_new: int, new_offset: int = 400000):
    """The `_daily_update_inputs` frame shapes from spark.range — same
    symbol spaces (1e5/2e5/4e5 offsets), same rotating raw date formats,
    same Korean-number fields, every 7th supplier delisted."""
    from pyspark.sql import functions as F

    sup = spark.range(1, n_sup + 1).select(F.col("id").alias("s_suppkey"))
    kospi = sup.select(
        (F.col("s_suppkey") + 100000).cast("string").alias("symbol"),
        F.concat(F.lit("Supplier#"), F.col("s_suppkey")).alias("name"),
    )
    kosdaq = spark.range(1, n_cust + 1).select(
        (F.col("id") + 200000).cast("string").alias("symbol"),
        F.concat(F.lit("Customer#"), F.col("id")).alias("name"),
    )
    pk3 = F.col("id") % 3
    raw_new = spark.range(1, n_new + 1).select(
        F.concat(F.lit("newco "), F.col("id")).alias("company_name"),
        (F.col("id") + new_offset).cast("string").alias("company_code"),
        F.when(pk3 == 0, F.lit("2024.01.15"))
        .when(pk3 == 1, F.lit("20240220"))
        .otherwise(F.lit("2024-03-10"))
        .alias("listing_date"),
        F.lit("500원").alias("par_value"),
        F.lit("1,000원").alias("ipo_price"),
        F.lit("KONEX").alias("market"),
    )
    sk3 = F.col("s_suppkey") % 3
    raw_delisted = sup.filter(F.col("s_suppkey") % 7 == 0).select(
        F.concat(F.lit("Supplier#"), F.col("s_suppkey")).alias("company_name"),
        (F.col("s_suppkey") + 100000).cast("string").alias("company_code"),
        F.when(sk3 == 0, F.lit("2023.12.31"))
        .when(sk3 == 1, F.lit("20231025"))
        .otherwise(F.lit("2023-11-30"))
        .alias("delisting_date"),
        F.concat(
            F.lit("reason-"), (F.col("s_suppkey") % 5).cast("string")
        ).alias("delisting_reason"),
        F.lit("KOSPI").alias("market"),
    )
    return {"KOSPI": kospi, "KOSDAQ": kosdaq}, raw_new, raw_delisted


def rehearse(spark, label: str, n_sup: int, n_cust: int, n_new: int,
             new_offset: int = 400000) -> dict:
    from pyspark.sql import functions as F

    from market_data_pipeline_spark.plans import pipelines as PL
    from market_data_pipeline_spark.storage.table import stock_master_table

    path = os.path.join(SCRATCH, label, "master")
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    per_market, raw_new, raw_delisted = crawl_inputs(
        spark, n_sup, n_cust, n_new, new_offset
    )
    master = stock_master_table(spark, path)

    def per_market_report():
        return {
            r["market"]: r.asDict()
            for r in master.read_current()
            .groupBy("market")
            .agg(
                F.count("*").cast("long").alias("total"),
                F.sum("is_active").cast("long").alias("active"),
            )
            .collect()
        }

    walls, days, reports = [], [], []
    for day in (1, 2):
        t0 = time.perf_counter()
        stats = PL.run_daily_update(
            master,
            per_market,
            raw_new,
            raw_delisted,
            now=dt.datetime(2024, 6, day, 2, 0, 0),
        )
        walls.append(round(time.perf_counter() - t0, 2))
        days.append(stats)
        reports.append(per_market_report())

    t0 = time.perf_counter()
    report = per_market_report()
    report_wall = round(time.perf_counter() - t0, 2)

    # the PER-MARKET report must be identical after day 1 and day 2 —
    # the scalar stats alone would miss a re-run that redistributes
    # rows between markets (r10 review)
    assert reports[0] == reports[1] == report, (reports, report)

    # idempotence ASSERTED at scale, not just timed
    assert days[1]["inserted_listed"] == 0, days[1]
    assert days[1]["inserted_new_listings"] == 0, days[1]
    for k in ("total", "active", "delisted"):
        assert days[0][k] == days[1][k], (k, days[0][k], days[1][k])
    expect_total = n_sup + n_cust + n_new
    assert days[1]["total"] == expect_total, (days[1]["total"], expect_total)
    assert days[1]["delisted"] == n_sup // 7

    return {
        "label": label,
        "symbols": expect_total,
        "day1_wall": walls[0],
        "day2_wall": walls[1],
        "report_wall": report_wall,
        "day2_stats": {k: days[1][k] for k in ("total", "active", "delisted")},
    }


def main() -> int:
    from market_data_pipeline_spark.session import get_spark

    spark = get_spark("pipeline3-100x")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm

    base = rehearse(spark, "base_1x", n_sup=1_000, n_cust=15_000, n_new=400)
    # the 6-digit symbol domain's maximum occupancy (~51x the base inputs)
    big = rehearse(spark, "domain_max", n_sup=100_000, n_cust=700_000,
                   n_new=40_000, new_offset=900_000)

    for r in (base, big):
        print(r)
    scale = big["symbols"] / base["symbols"]
    for phase in ("day1_wall", "day2_wall"):
        ratio = big[phase] / base[phase]
        exp = math.log(ratio) / math.log(scale)
        print(f"{phase}: {base[phase]}s -> {big[phase]}s "
              f"(ratio {ratio:.1f}x at {scale:.0f}x symbols, "
              f"observed exponent {exp:.2f})")
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
