"""Retroactive concept audit: sweep the FULL registry against itself for
conceptual duplicates (r6 verdict #4 — concept_check.py only gated
registrations authored after it existed; six correct duplicates slipped
into one round-6 session before being caught by hand).

For every query pair, scores similarity as the max of:
  - Jaccard over docstring word sets (stopword-filtered), and
  - Jaccard over normalized oracle-SQL token sets (identifiers/keywords;
    literals and numbers stripped, since two different concepts can share
    SQL scaffolding but true duplicates share the business tokens too).

Prints every pair above the threshold, sorted by score, with first
docstring lines so each can be adjudicated in one read. The committed
adjudication log lives in docs/CONCEPT_AUDIT_r07.md.

Usage: python scripts/concept_audit.py [--threshold 0.5] [--top 60]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STOP = set(
    """the a an of to in on for per and or with by via over is are be as at
    from into each one two no not its this that — - returns return query
    oracle spark sql duckdb engine exact row rows column columns group
    groups groupby window windows shuffle map only the same see where
    when then else case cast select order limit all any both sides
    table tables""".split()
)


def doc_tokens(doc: str) -> set[str]:
    words = re.findall(r"[a-z][a-z0-9_]{2,}", doc.lower())
    return {w for w in words if w not in STOP}


def sql_tokens(sql: str) -> set[str]:
    sql = re.sub(r"'[^']*'", " ", sql)  # string literals
    sql = re.sub(r"\b\d+(\.\d+)?(e-?\d+)?\b", " ", sql)  # numbers
    toks = re.findall(r"[a-z_][a-z0-9_]{2,}", sql.lower())
    return {t for t in toks if t not in STOP}


def jaccard(a: set, b: set, min_size: int = 1) -> float:
    # tiny sets make Jaccard unstable: two 4-token §2 scaffolding queries
    # hit 0.75 on 3 shared column names without sharing a concept
    if len(a) < min_size or len(b) < min_size:
        return 0.0
    return len(a & b) / len(a | b)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--top", type=int, default=60)
    args = ap.parse_args()

    from market_data_pipeline_spark.plans.driver_queries import ORACLES, QUERIES

    docs = {n: doc_tokens(fn.__doc__ or "") for n, fn in QUERIES.items()}
    sqls = {n: sql_tokens(ORACLES.get(n, "")) for n in QUERIES}
    # drop scaffolding tokens: anything appearing in >25% of queries
    # (PRICE_CTE column names, tpch schema, boilerplate keywords) carries
    # no concept signal and made raw Jaccard flag 2.6k pairs
    for toks in (docs, sqls):
        df: dict[str, int] = {}
        for s in toks.values():
            for t in s:
                df[t] = df.get(t, 0) + 1
        cap = 0.25 * len(toks)
        common = {t for t, c in df.items() if c > cap}
        for n in toks:
            toks[n] = toks[n] - common
    names = sorted(QUERIES)
    scored = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            s_doc = jaccard(docs[a], docs[b], min_size=8)
            s_sql = jaccard(sqls[a], sqls[b], min_size=12)
            s = max(s_doc, s_sql)
            if s >= args.threshold:
                scored.append((s, s_doc, s_sql, a, b))
    scored.sort(reverse=True)
    for s, s_doc, s_sql, a, b in scored[: args.top]:
        da = (QUERIES[a].__doc__ or "").strip().splitlines()
        db = (QUERIES[b].__doc__ or "").strip().splitlines()
        print(f"{s:.2f} (doc {s_doc:.2f} / sql {s_sql:.2f})  {a}  ~  {b}")
        print(f"      {a}: {da[0] if da else '(no doc)'}")
        print(f"      {b}: {db[0] if db else '(no doc)'}")
    print(f"\n{len(scored)} pair(s) >= {args.threshold} across {len(names)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
