"""Round-boundary protocol, automated (r4 verdict #7).

Rounds 2-4 each lost part of the driver's ~50-row recording window to
ordering drift that a 20-line preview would have caught. Run this as the
FIRST action of every round:

    python scripts/round_open.py [--window 50] [--skip-oracle] [--skip-plan]

Steps:
1. Find the newest CORRECTNESS_r*.json and fold its hash-green rows into
   __spark_entry__'s green frozenset via scripts/update_green.py --apply
   (no-op if already applied). Any query still missing a green row in
   EVERY correctness file is reported — those belong in the frozen
   tier-0 backlog.
2. Emit the expected recording-window preview: the first N names of
   queries() iteration order, i.e. what the driver will record.
3. Re-run the full local oracle gate (scripts/check_oracle.py, sf0.01).
4. Re-run the registry-wide plan invariant (tests/test_plan_quality.py).

Exit nonzero if any step fails; commit the regenerated frozensets plus
this preview before doing anything else in the round.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--skip-plan", action="store_true")
    args = ap.parse_args()

    corr_files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not corr_files:
        print("no CORRECTNESS_r*.json yet (round 1) — nothing to fold")
    else:
        latest = corr_files[-1]
        print(f"== 1. folding greens from {os.path.basename(latest)}")
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "update_green.py"),
             latest, "--apply"],
        ).returncode
        if rc != 0:
            return rc

    import __spark_entry__ as entry  # after the fold so frozensets are fresh

    q = entry.queries()
    oracles = entry.oracle_sql()
    ever_green: set[str] = set()
    for path in corr_files:
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") is True:
                ever_green.add(name)
    never = [n for n in q if n in oracles and n not in ever_green]
    print(f"\n== registered: {len(q)}  oracled: {len(oracles)}  "
          f"ever driver-green: {len(ever_green & set(oracles))}")
    print(f"== oracled but never driver-green ({len(never)}): {sorted(never)}")
    if len(never) > args.window:
        print(f"!! more never-green queries than window slots ({args.window}) — "
              "freeze the most expensive as the next round's backlog")

    print(f"\n== 2. expected recording-window preview (first {args.window}):")
    for i, name in enumerate(list(q)[: args.window], 1):
        tag = "" if name in ever_green else "   <-- needs green row"
        print(f"  {i:3d} {name}{tag}")

    if not args.skip_oracle:
        print("\n== 3. full local oracle gate (sf0.01)")
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "check_oracle.py")]
        ).returncode
        if rc != 0:
            return rc

    if not args.skip_plan:
        print("\n== 4. registry-wide plan invariant")
        rc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/test_plan_quality.py", "-x", "-q"],
            cwd=REPO,
        ).returncode
        if rc != 0:
            return rc

    print("\n== round open: all steps green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
