"""Regenerate __spark_entry__._GREEN_R1_R2 from the driver's CORRECTNESS
files.

The driver records only a ~50-row prefix of queries() iteration order per
round, so the entry module orders unproven oracled queries first and
already-green ones after. After each round, run this to fold the new
round's hash-green rows into the frozenset (printed ready to paste, and
optionally applied in place with --apply):

    python scripts/update_green.py CORRECTNESS_r03.json [--apply]
"""

from __future__ import annotations

import json
import re
import sys
import textwrap


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--apply"]
    apply = "--apply" in sys.argv
    if not args:
        sys.exit("usage: update_green.py CORRECTNESS_rNN.json [--apply]")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    green = set(entry._GREEN_R1_R2)
    added = []
    for path in args:
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") is True and name not in green:
                green.add(name)
                added.append(name)

    body = textwrap.fill(
        ", ".join(f'"{n}"' for n in sorted(green)) + ",",
        width=76,
        initial_indent="    ",
        subsequent_indent="    ",
    )
    block = "_GREEN_R1_R2 = frozenset({\n" + body + "\n})"
    print(f"# +{len(added)} newly green: {sorted(added)}")
    print(block)

    if apply and added:
        src = open("/root/repo/__spark_entry__.py").read()
        new_src, n = re.subn(
            r"_GREEN_R1_R2 = frozenset\(\{.*?\}\)", block, src, flags=re.S
        )
        if n != 1:
            sys.exit("could not locate the frozenset block to replace")
        open("/root/repo/__spark_entry__.py", "w").write(new_src)
        print(f"# applied to __spark_entry__.py ({len(added)} names added)")


if __name__ == "__main__":
    main()
