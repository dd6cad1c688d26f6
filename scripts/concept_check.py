"""Registry concept-overlap check: run BEFORE authoring a new query.

The round-6 duplicate audit (BENCHNOTES "batch 11") removed six
individually oracle-PASSing drafts that duplicated long-green queries
(Amihud, lag-1 autocorr, drawdown duration, bounce rate, conversion
latency, robust scaling). A value gate cannot catch a correct
duplicate — the overlap check has to be conceptual, against the
registry's names AND docstrings AND SQL, not just an exact-name grep.

Usage:
    python scripts/concept_check.py amihud illiquidity
    python scripts/concept_check.py "bounce rate"
    python scripts/concept_check.py --list ts    # dump a family's one-liners

Prints every registered query whose name, docstring, or oracle SQL
matches ANY of the given terms (case-insensitive substring), with the
first docstring line so the overlap is judged in one read. Exit code 1
if anything matched — wire it into an authoring checklist as a gate:
a hit means read the match before writing a line of the new query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--list"]
    list_mode = "--list" in sys.argv
    if not args:
        print(__doc__)
        return 2

    from market_data_pipeline_spark.plans.driver_queries import (
        ORACLES,
        QUERIES,
    )

    terms = [a.lower() for a in args]
    hits = []
    for name, fn in QUERIES.items():
        doc = (fn.__doc__ or "").strip()
        sql = ORACLES.get(name, "")
        hay = f"{name}\n{doc}\n{sql}".lower()
        if list_mode:
            if any(name.startswith(t) for t in terms):
                hits.append((name, doc))
        elif any(t in hay for t in terms):
            hits.append((name, doc))

    for name, doc in sorted(hits):
        first = doc.splitlines()[0] if doc else "(no docstring)"
        print(f"{name}: {first}")
    print(f"\n{len(hits)} match(es) for {terms}")
    return 1 if hits else 0


if __name__ == "__main__":
    sys.exit(main())
