"""Derive the driver-prefix rotation from CORRECTNESS_r*.json history
(VERDICT r8 item: the hand-maintained _PRIORITY list is what let
stale-evidence rows go unnoticed for two rounds — the order is now
COMPUTED, and tests/test_priority.py pins the committed list to the
computation so it can't silently drift).

Policy (the same one the hand list implemented, now mechanical):
  tier 0  CHANGED_THIS_ROUND — queries whose code/plan changed after
          their newest driver row (hand-declared per round in
          pyspark_recs/workloads/priority.py: change detection needs
          human judgment about which edits are semantic), followed by
          any query whose NEWEST driver row is non-green (red rows
          re-check first).
  tier 1  queries never driver-checked, in registry-source order.
  tier 2  drift watch — everything else, OLDEST newest-round first;
          within a round, that file's row order (stable).

Usage: python tools/derive_priority.py          # rewrite priority.py
       python tools/derive_priority.py --check  # exit 1 if stale
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRIORITY_PATH = os.path.join(REPO, "pyspark_recs", "workloads", "priority.py")


def registry_names() -> list:
    """All registered query names in module-source order (the order
    never-checked queries enter the rotation)."""
    from pyspark_recs.workloads import llmops, recsys, relational, streaming

    names: list = []
    for mod in (relational, llmops, recsys, streaming):
        names.extend(mod.QUERIES)
    return names


def history(max_round: int, root: str = REPO) -> dict:
    """name -> (newest_round, row_position_in_that_file, green)."""
    out: dict = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        rnd = int(m.group(1))
        if rnd > max_round:
            continue
        rows = json.load(open(f))
        for pos, (name, row) in enumerate(rows.items()):
            green = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True) is not False
                and not row.get("err")
            )
            prev = out.get(name)
            if prev is None or rnd >= prev[0]:
                out[name] = (rnd, pos, green)
        # a name can appear once per file; rnd strictly increases over
        # the sorted glob, so "newest wins" is the >= above
    return out


def derive(changed: list, max_round: int, root: str = REPO) -> list:
    names = registry_names()
    hist = history(max_round, root)
    tier0 = [n for n in changed if n in names]
    reds = sorted(
        (n for n in names if n in hist and not hist[n][2] and n not in tier0),
        key=lambda n: (hist[n][0], hist[n][1]),
    )
    never = [n for n in names if n not in hist and n not in tier0]
    rest = sorted(
        (
            n
            for n in names
            if n in hist and hist[n][2] and n not in tier0
        ),
        key=lambda n: (hist[n][0], hist[n][1]),
    )
    return tier0 + reds + never + rest


def main() -> int:
    from pyspark_recs.workloads import priority as P

    order = derive(P.CHANGED_THIS_ROUND, P.DERIVED_FROM_ROUNDS)
    if list(P.PRIORITY) == order:
        print(f"priority.py up to date ({len(order)} queries)")
        return 0
    if "--check" in sys.argv:
        print("priority.py is STALE — run tools/derive_priority.py")
        return 1
    src = open(PRIORITY_PATH).read()
    body = "PRIORITY = [\n"
    for n in order:
        body += f'    "{n}",\n'
    body += "]\n"
    new = re.sub(r"PRIORITY = \[.*?\]\n", body, src, count=1, flags=re.S)
    open(PRIORITY_PATH, "w").write(new)
    print(f"priority.py rewritten ({len(order)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
