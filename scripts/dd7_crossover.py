"""Measure the blocked_name_pairs regime crossover (r8 verdict #3).

The deletion-neighborhood rewrite (r8 §G-100x) left two thresholds as
judgment calls: ``deletion_min_rows=5000`` (below it the quadratic
in-block expansion wins) and ``deletion_max_len=48`` (above it the
~L^2/2-per-row variant explode is assumed to lose). This script
measures both crossovers on supplier-shaped corpora so the thresholds
are provenance-backed numbers, not guesses:

- **rows sweep**: corpora of n in {1k..50k} names (sf0.1 suppliers,
  replicated with digit-perturbed copies so near-dup pairs exist),
  25-value block key (the nation shape), name length ~18 — both
  regimes timed.
- **length sweep**: n=10k corpora with names padded to L in
  {18, 48, 96, 144} — both regimes timed (the deletion explode grows
  ~L^2; the quadratic path's levenshtein verify grows ~L^2 too, on
  k^2/25 pairs — which is why long names do NOT rescue the quadratic
  plan at data scale; n=10k single-shot because the 20k quadratic run
  at L>=96 is tens of minutes, the result already unambiguous).

Row-sweep timings are best-of-2 noop counts on a warmed local[32]
session; the length sweep is single-shot. Results land in SCALE.md §C;
the thresholds in operators/dedup.py cite this script.

Usage: python scripts/dd7_crossover.py [rows|length]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
SCRATCH = os.path.join(REPO, ".scratch", "dd7_crossover")

ROWS_SWEEP = [1_000, 2_000, 5_000, 10_000, 20_000, 50_000]
LEN_SWEEP = [18, 48, 96, 144]
LEN_SWEEP_ROWS = 10_000


def build() -> None:
    import duckdb

    shutil.rmtree(SCRATCH, ignore_errors=True)
    os.makedirs(SCRATCH, exist_ok=True)
    con = duckdb.connect()
    # base pool: 50k unique names derived from sf0.1 suppliers (1k rows)
    # by 50 digit-perturbed replicas — every replica is within a few
    # edits of its source, so true near-dup pairs exist at every n
    con.execute(
        f"""
        CREATE VIEW pool AS
        SELECT (s_suppkey + 1000000 * i)::BIGINT AS id,
               s_nationkey AS block,
               s_name || CASE WHEN i = 0 THEN '' ELSE '#' || i::VARCHAR END
                 AS name
        FROM '{SRC}/supplier.parquet',
             (SELECT UNNEST(RANGE(50)) AS i)
        """
    )
    for n in ROWS_SWEEP:
        con.execute(
            f"COPY (SELECT id, block, name FROM pool ORDER BY id LIMIT {n}) "
            f"TO '{SCRATCH}/rows_{n}.parquet' (FORMAT PARQUET)"
        )
    for L in LEN_SWEEP:
        # pad deterministically to length L (suffix varies per row so
        # padding doesn't create artificial exact duplicates)
        con.execute(
            f"COPY (SELECT id, block, "
            f"SUBSTR(name || REPEAT('x', {L}) || id::VARCHAR, 1, {L}) AS name "
            f"FROM pool ORDER BY id LIMIT {LEN_SWEEP_ROWS}) "
            f"TO '{SCRATCH}/len{LEN_SWEEP_ROWS}_{L}.parquet' (FORMAT PARQUET)"
        )


def main() -> int:
    from market_data_pipeline_spark.operators.dedup import blocked_name_pairs
    from market_data_pipeline_spark.session import get_spark

    marker = f"{SCRATCH}/len{LEN_SWEEP_ROWS}_{LEN_SWEEP[-1]}.parquet"
    if not os.path.exists(marker):
        build()
    spark = get_spark("dd7-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def run(path: str, regime: str, shots: int = 2) -> tuple[float, int]:
        df = spark.read.parquet(path)
        best, n_pairs = float("inf"), -1
        for _ in range(shots):
            t0 = time.perf_counter()
            out = blocked_name_pairs(df, "block", "id", "name", regime=regime)
            n_pairs = out.count()
            best = min(best, time.perf_counter() - t0)
        return best, n_pairs

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("rows", "both"):
        rows_sweep(run)
    if which in ("length", "both"):
        length_sweep(run)
    return 0


def rows_sweep(run) -> None:
    print("## rows sweep (name len ~18-24, 25 blocks)")
    print("| n rows | quadratic (s) | deletion (s) | pairs | winner |")
    print("|---|---|---|---|---|")
    for n in ROWS_SWEEP:
        p = f"{SCRATCH}/rows_{n}.parquet"
        tq, pq = run(p, "quadratic")
        td, pd_ = run(p, "deletion")
        assert pq == pd_, f"regime mismatch at n={n}: {pq} vs {pd_}"
        w = "deletion" if td < tq else "quadratic"
        print(f"| {n} | {tq:.2f} | {td:.2f} | {pq} | {w} |")


def length_sweep(run) -> None:
    print(f"\n## length sweep (n={LEN_SWEEP_ROWS}, 25 blocks, single-shot)")
    print("| name len | quadratic (s) | deletion (s) | pairs | winner |")
    print("|---|---|---|---|---|")
    for L in LEN_SWEEP:
        p = f"{SCRATCH}/len{LEN_SWEEP_ROWS}_{L}.parquet"
        tq, pq = run(p, "quadratic", shots=1)
        td, pd_ = run(p, "deletion", shots=1)
        assert pq == pd_, f"regime mismatch at L={L}: {pq} vs {pd_}"
        w = "deletion" if td < tq else "quadratic"
        print(f"| {L} | {tq:.2f} | {td:.2f} | {pq} | {w} |", flush=True)


if __name__ == "__main__":
    raise SystemExit(main())
