"""Regenerate __spark_entry__'s green/backlog sets from the driver's
CORRECTNESS files.

The driver records only a ~50-row prefix of queries() iteration order per
round, so the entry module orders the frozen never-green backlog first,
new registrations second, already-green ones after. After each round, run
this to fold the new round's hash-green rows into the green frozenset and
REMOVE them from the backlog (printed ready to paste, and optionally
applied in place with --apply):

    python scripts/update_green.py CORRECTNESS_r04.json [--apply]

Works against whatever the current set names are (_GREEN_R1_R<N> /
_BACKLOG_R<N>) — it matches by prefix, keeps the names, and only edits
membership.
"""

from __future__ import annotations

import json
import re
import sys
import textwrap

ENTRY = "/root/repo/__spark_entry__.py"


def _block(name: str, names: set[str]) -> str:
    if not names:  # an empty literal "{ , }" would be a syntax error
        return f"{name} = frozenset()"
    body = textwrap.fill(
        ", ".join(f'"{n}"' for n in sorted(names)) + ",",
        width=76,
        initial_indent="    ",
        subsequent_indent="    ",
    )
    return f"{name} = frozenset({{\n{body}\n}})"


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--apply"]
    apply = "--apply" in sys.argv
    if not args:
        sys.exit("usage: update_green.py CORRECTNESS_rNN.json [--apply]")

    src = open(ENTRY).read()
    green_name = re.search(r"(_GREEN_(?:R1_R\d+|PRIOR)) = frozenset", src)
    backlog_name = re.search(r"(_BACKLOG_R\d+) = frozenset", src)
    bank_name = re.search(r"(_BANK_R\d+) = frozenset", src)
    if not green_name:
        sys.exit("no _GREEN_* frozenset found in __spark_entry__.py")
    green_name = green_name.group(1)
    backlog_name = backlog_name.group(1) if backlog_name else None
    bank_name = bank_name.group(1) if bank_name else None

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    green = set(getattr(entry, green_name))
    backlog = set(getattr(entry, backlog_name)) if backlog_name else set()
    bank = set(getattr(entry, bank_name)) if bank_name else set()
    added = []
    for path in args:
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") is True and name not in green:
                green.add(name)
                added.append(name)
    drained = sorted(backlog & green)
    backlog -= green
    bank_drained = sorted(bank & green)
    bank -= green

    print(f"# +{len(added)} newly green: {sorted(added)}")
    if backlog_name:
        print(f"# backlog drained: {drained}; {len(backlog)} remain: {sorted(backlog)}")
    if bank_name:
        print(f"# bank drained: {bank_drained}; {len(bank)} remain: {sorted(bank)}")
    print(_block(green_name, green))

    if apply and added:
        new_src, n = re.subn(
            green_name + r" = frozenset\((?:\{.*?\})?\)",
            _block(green_name, green),
            src,
            flags=re.S,
        )
        if n != 1:
            sys.exit("could not locate the green frozenset block to replace")
        if backlog_name:
            new_src, n = re.subn(
                backlog_name + r" = frozenset\((?:\{.*?\})?\)",
                _block(backlog_name, backlog),
                new_src,
                flags=re.S,
            )
            if n != 1:
                sys.exit("could not locate the backlog frozenset block to replace")
        if bank_name:
            new_src, n = re.subn(
                bank_name + r" = frozenset\((?:\{.*?\})?\)",
                _block(bank_name, bank),
                new_src,
                flags=re.S,
            )
            if n != 1:
                sys.exit("could not locate the bank frozenset block to replace")
        open(ENTRY, "w").write(new_src)
        print(
            f"# applied ({len(added)} green added, {len(drained)} backlog "
            f"drained, {len(bank_drained)} bank drained)"
        )


if __name__ == "__main__":
    main()
