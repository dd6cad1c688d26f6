"""Plan-health audit over the whole query surface.

For every queries() entry, prints one line of plan facts: number of
broadcast / sort-merge joins, shuffle exchanges, whether parquet scans
have pushed filters, and the widest ReadSchema column count. This is the
"measure, don't guess" loop for plan regressions: a dim join degrading
from broadcast to SMJ, or a scan losing its pushdown, shows up as a diff
in this output long before it shows up in bench timings.

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from market_data_pipeline_spark.plans.driver_queries import QUERIES  # noqa: E402
from market_data_pipeline_spark.session import get_spark  # noqa: E402


def audit_plan(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    scans = re.findall(r"\(\d+\) Scan parquet", p)
    pushed = re.findall(r"PushedFilters: \[(?!\])", p)  # non-empty filter lists
    read_schemas = [
        s.count(",") + 1 for s in re.findall(r"ReadSchema: struct<([^>]*)>", p) if s
    ]
    return {
        "bhj": len(re.findall(r"BroadcastHashJoin", p)),
        "smj": len(re.findall(r"SortMergeJoin", p)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", p)),
        "shuffles": len(re.findall(r"\(\d+\) Exchange", p)),
        "scans": len(scans),
        "pushed_scans": len(pushed),
        # a partition-less Window / global non-top-k sort plans as an
        # Exchange SinglePartition — the one-task scale-killer pattern.
        # explain("formatted") moves the partitioning to an "Arguments:"
        # detail line, so match both renderings (the bare regex alone
        # silently under-counted formatted plans).
        "single_partition_exchanges": len(
            re.findall(r"Exchange SinglePartition", p)
        )
        + len(re.findall(r"Arguments: SinglePartition", p)),
        # the REFINED scale signal: a SinglePartition exchange whose child
        # is a partial aggregate merges ONE partial row per upstream
        # partition — the canonical (and scale-safe) global-agg plan. One
        # sitting on anything else funnels actual data rows through one
        # task. Only the latter is a defect.
        "unbounded_single_partition": _unbounded_single_partition(p),
        "max_read_cols": max(read_schemas, default=0),
        "codegen_spans": len(re.findall(r"WholeStageCodegen", p)),
        # raw formatted plan, for tests that assert node placement (e.g.
        # "the bloom predicate filters the scan, not the join output")
        "plan_text": p,
    }


def _unbounded_single_partition(p: str) -> int:
    """Count SinglePartition exchanges whose tree child is NOT an
    aggregate (see audit_plan). Parses the formatted-explain tree: node
    ids whose detail block says ``Arguments: SinglePartition``, then the
    first tree line below the exchange's with deeper indentation —
    descending through row-count-preserving/reducing pass-through nodes
    (Project, Filter): a projection over a partial aggregate (e.g. the
    window's sort-key expression) does not unbound the exchange."""
    sp_ids = {
        int(m.group(1))
        for m in re.finditer(
            r"^\((\d+)\) Exchange\n(?:[^\n(]*\n)*?Arguments: SinglePartition",
            p,
            re.M,
        )
    }
    if not sp_ids:
        return 0
    tree = []
    for line in p.splitlines():
        m = re.search(r"^(.*?)(\w[\w]*(?: \w+)*) \((\d+)\)$", line.rstrip())
        if m:
            prefix, name, nid = m.group(1), m.group(2), int(m.group(3))
            tree.append((len(prefix), name, nid))
    count = 0
    for i, (indent, name, nid) in enumerate(tree):
        if nid in sp_ids:
            below = [t for t in tree[i + 1 :] if t[0] > indent]
            child = below[0] if below else None
            j = 0
            while (
                child is not None
                and child[1].split()[0] in ("Project", "Filter")
                and j + 1 < len(below)
            ):
                j += 1
                child = below[j]
            if child is None or "Aggregate" not in child[1]:
                count += 1
    return count


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    hdr = f"{'query':28s} {'BHJ':>3} {'SMJ':>3} {'NLJ':>3} {'xchg':>4} {'scans':>5} {'push':>4} {'cols':>4}"
    print(hdr)
    for name in names:
        try:
            facts = audit_plan(QUERIES[name](spark, sf_dir))
        except Exception as e:  # streaming queries execute on build; skip cleanly
            print(f"{name:28s} (unplannable here: {type(e).__name__})")
            continue
        print(
            f"{name:28s} {facts['bhj']:>3} {facts['smj']:>3} {facts['bnlj']:>3}"
            f" {facts['shuffles']:>4} {facts['scans']:>5} {facts['pushed_scans']:>4}"
            f" {facts['max_read_cols']:>4}"
        )


if __name__ == "__main__":
    main()
