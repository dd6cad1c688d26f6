"""CLI: the daily stock-master batch (reference:
scripts/daily_stock_master_update.py:370-383 — the execution layer over
the library pipelines).

Runs listed-stock upsert + new-listing sync + delisted sync + compaction
against a parquet master table. Sources come from the real network
adapters by default; ``--fixture-dir`` substitutes saved HTML/parquet
fixtures for offline/deterministic runs (how the tests drive the same
code).

Usage:
  python scripts/daily_update.py --master /data/master \\
      [--backup-dir /data/backups] [--fixture-dir tests/fixtures]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--master", required=True, help="master table parquet path")
    ap.add_argument("--backup-dir", default=None)
    ap.add_argument("--fixture-dir", default=None, help="dir with delisted.html / listings.html")
    ap.add_argument("--markets", nargs="+", default=["KOSPI", "KOSDAQ", "KONEX"])
    args = ap.parse_args()

    from market_data_pipeline_spark.plans import pipelines as pl
    from market_data_pipeline_spark.session import get_spark
    from market_data_pipeline_spark.sources import krx
    from market_data_pipeline_spark.sources.fdr import FdrListingSource
    from market_data_pipeline_spark.storage.table import stock_master_table

    spark = get_spark("daily-update")
    spark.sparkContext.setLogLevel("WARN")

    transport = None
    if args.fixture_dir:
        def transport(url: str, form: dict) -> bytes:  # noqa: ANN001
            name = "delisted.html" if "delcompany" in url else "listings.html"
            with open(os.path.join(args.fixture_dir, name), "rb") as f:
                return f.read()

    delisted_src = krx.KrxDelistedSource(spark, transport=transport)
    listing_src = krx.KrxNewListingSource(spark, transport=transport)
    fdr_src = FdrListingSource(spark) if not args.fixture_dir else None

    master = stock_master_table(spark, args.master)
    per_market = fdr_src.fetch_all(markets=tuple(args.markets)) if fdr_src else {}
    report = pl.run_daily_update(
        master,
        per_market,
        listing_src.fetch_all(markets=tuple(args.markets)),
        delisted_src.fetch_all(markets=tuple(args.markets)),
        backup_dir=args.backup_dir,
    )
    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
