"""Benchmark harness: runs the oracle-checked query surface at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (computes the
full plan, no driver collect and no disk I/O in the measurement).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from market_data_pipeline_spark.plans.driver_queries import QUERIES  # noqa: E402
from market_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def family_diff(
    current: dict[str, float],
    previous: dict[str, float],
    threshold: float = 1.3,
    min_sec: float = 1.0,
) -> list[dict]:
    """Per-family regression flags vs the previous round's bench (r7
    verdict #7: the k-family decimal-fold cost was only caught by
    self-report — make the budget mechanical). A family is flagged when
    its subtotal grew past ``threshold``x AND by at least ``min_sec``
    (sub-second families swing on session noise alone). New families
    (no previous entry) are never flagged — they are registrations,
    not regressions."""
    flags = []
    for fam, cur in sorted(current.items()):
        prev = previous.get(fam)
        if not prev or prev <= 0:
            continue
        if cur >= prev * threshold and cur - prev >= min_sec:
            flags.append(
                {"family": fam, "prev": prev, "cur": cur, "ratio": round(cur / prev, 2)}
            )
    return flags


def family_subtotals(
    timings: dict[str, float], exclude: set[str] | frozenset[str] = frozenset()
) -> dict[str, float]:
    """Per-family wall subtotals, optionally excluding named queries —
    the budget diff passes the never-driver-green registrations here so
    a new member's cost can't masquerade as a family regression."""
    fams: dict[str, float] = {}
    for name, t in timings.items():
        if name in exclude:
            continue
        fam = re.match(r"[a-z]+", name).group(0)
        fams[fam] = round(fams.get(fam, 0.0) + t, 2)
    return fams


def load_prev_families(
    repo_dir: str, window: int = 3, exclude: tuple[str, ...] = ()
) -> tuple[str, dict[str, float]]:
    """Per-family MEDIAN subtotal over the newest ``window`` usable
    BENCH_r*.json files — the baseline for family_diff.

    Median-of-3, not single-newest (r8 verdict #7): a slow two-round
    creep can't hide under the 1.3x single-round gate when two older
    rounds anchor the median. It also defuses the self-comparison
    no-op (r8 ADVICE #3): if the CURRENT round's recording is already
    on disk it is at most one of the three files, so the flags still
    compare against history. Files named in ``exclude`` or in
    $SPARK_GRAFT_BENCH_EXCLUDE (comma-separated basenames) are
    skipped outright. Returns ("", {}) when no usable file.
    """
    import glob
    import statistics

    skip = set(exclude) | {
        s for s in os.environ.get("SPARK_GRAFT_BENCH_EXCLUDE", "").split(",") if s
    }
    used: list[tuple[str, dict[str, float]]] = []
    for path in sorted(glob.glob(os.path.join(repo_dir, "BENCH_r*.json")), reverse=True):
        if os.path.basename(path) in skip:
            continue
        try:
            data = json.load(open(path))
            # driver files wrap the parsed line under "parsed" or store it raw
            for cand in (data.get("parsed") if isinstance(data, dict) else None, data):
                if isinstance(cand, dict) and isinstance(cand.get("families"), dict):
                    used.append((os.path.basename(path), cand["families"]))
                    break
        except Exception:
            continue
        if len(used) >= window:
            break
    if not used:
        return "", {}
    fams: dict[str, float] = {}
    for fam in {f for _, d in used for f in d}:
        vals = [d[fam] for _, d in used if fam in d and isinstance(d[fam], (int, float))]
        if vals:
            fams[fam] = round(statistics.median(vals), 2)
    return "median(" + ",".join(n for n, _ in used) + ")", fams


def main() -> None:
    # The driver parses stdout as JSON; anything the JVM launcher or a
    # stray library prints to fd 1 breaks that (BENCH_r01 recorded
    # "parsed": null despite an intact JSON line in the tail).  Redirect
    # the OS-level stdout to stderr for the entire run and keep a dup of
    # the real stdout for the single JSON line at the end.
    real_stdout_fd = os.dup(1)
    sys.stdout.flush()
    os.dup2(2, 1)

    spark = get_spark("mdps-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/session so the first measured query doesn't pay startup
    spark.range(1000).selectExpr("sum(id)").collect()
    # warm the Arrow python workers too: the FIRST pandas-UDF stage of a
    # session forks one worker per core (~5s on 32 cores even with the
    # preloading daemon); that's session fixed cost, not query cost
    import pandas as pd  # noqa: F401
    from pyspark.sql.pandas.functions import pandas_udf

    def _noop(x: "pd.Series") -> "pd.Series":
        return x

    _noop.__annotations__ = {"x": pd.Series, "return": pd.Series}
    spark.range(0, 3200, 1, 32).select(pandas_udf(_noop, "long")("id")).write.mode(
        "overwrite"
    ).format("noop").save()

    # best-of-2 per query: single-shot numbers on a busy box swing 3-4x
    # (GC, page cache, JIT); the min is the reproducible cost of the plan
    import gc

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 2)
        # drop python-side DataFrame refs so the ContextCleaner can free
        # localCheckpoint blocks between queries — without this the block
        # manager grows monotonically over the 100+-query session and GC
        # pressure inflates the late queries' timings
        gc.collect()

    total = round(sum(timings.values()), 2)
    # Truncation defense (BENCH_r02 recorded "parsed": null because the
    # driver's tail capture clipped the head of the 113-entry line):
    # summary fields FIRST, per-family subtotals next, per-query dict last;
    # compact separators + 2-decimal times keep the whole line well under a
    # 4 KiB tail buffer so it parses end-to-end.
    families = family_subtotals(timings)
    # machine-generated family budget (r7 verdict #7): diff vs the
    # previous round's recorded bench, flag >1.3x + >=1s growth. Table
    # goes to stderr (stdout is reserved for the parseable JSON lines);
    # flags ride in both JSON lines so the driver records them too.
    #
    # Like-for-like: a query registered THIS round has no cost in any
    # historical baseline, so its family's subtotal inflates and flags a
    # "regression" that is really a registration (observed r9: pipeline3
    # 10.4s flagged the pipeline family at 2.33x). The diff therefore
    # excludes oracled-but-never-driver-green queries (the tier-0 "new"
    # set per the CORRECTNESS trail); rows-only queries stay in — they
    # never turn green, and excluding them would hide their regressions
    # forever. The RECORDED subtotals keep everything, so next rounds'
    # baselines include the new members.
    new_names: set[str] = set()
    try:
        from __spark_entry__ import ORACLES, _newest_green_round

        vintage = _newest_green_round()
        new_names = {n for n in timings if n in ORACLES and n not in vintage}
    except Exception:
        pass
    diff_families = family_subtotals(timings, exclude=new_names)
    if new_names:
        print(
            f"== family budget excludes {len(new_names)} never-green "
            f"registration(s): {sorted(new_names)}",
            file=sys.stderr,
        )
    prev_name, prev_families = load_prev_families(
        os.path.dirname(os.path.abspath(__file__))
    )
    regressions = family_diff(diff_families, prev_families) if prev_families else []
    if prev_families:
        print(f"\n== family diff vs {prev_name} ==", file=sys.stderr)
        for fam in sorted(families):
            p = prev_families.get(fam)
            flag = " <-- REGRESSION" if any(
                r["family"] == fam for r in regressions
            ) else ""
            print(
                f"  {fam:10s} {p if p is not None else '-':>8} -> "
                f"{families[fam]:>8.2f}{flag}",
                file=sys.stderr,
            )
    line = json.dumps(
        {
            "metric": "total_query_wall_time",
            "value": total,
            "unit": "sec",
            "sf": sf_from_dir(SF_DIR),
            "n_queries": len(timings),
            "families": families,
            "family_regressions": regressions,
            "queries": timings,
        },
        separators=(",", ":"),
    )
    sys.stdout.flush()
    sys.stderr.flush()
    os.dup2(real_stdout_fd, 1)
    os.close(real_stdout_fd)
    print(line, flush=True)
    # Tail-truncation defense (r3 verdict #2): the driver keeps a *tail*
    # buffer of stdout, so a >4 KiB main line gets its HEAD clipped — which
    # is where r3 put the summary. Emit a second, short, summary-only JSON
    # line AFTER the main line: the end of the output always parses, and
    # the totals are recoverable from BENCH_r{N}.json without git
    # archaeology even when the per-query dict is clipped.
    print(
        json.dumps(
            {
                "bench_total_sec": total,
                "n_queries": len(timings),
                "sf": sf_from_dir(SF_DIR),
                "families": families,
                "family_regressions": regressions,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
