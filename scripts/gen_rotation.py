"""Generate the driver-verification rotation for the query registry.

The external driver's correctness run covers only the FIRST 50 registry
entries, while the registry has grown past that cap — so which entries
get an independent driver-green row each round is decided by ordering.
Round 5 ordered the registry by hand; this script automates the policy
the round-5 verdict asked for (item 3): emit the order from the recorded
CORRECTNESS_r*.json history so the head of the registry is provably the
least-recently-driver-verified set.

Policy (stable round-robin):
  1. entries with NO driver-green row in any recorded round come first
     (new queries, or entries whose latest driver row failed),
  2. then descending staleness = latest_round - last_green_round,
  3. ties keep the hand-written registry order (stable sort).

Every entry pushed past the cap in round N is maximally stale by round
N+1 and rotates back into the verified head, so with ~64 entries and a
50-entry cap each query re-enters the driver-verified set at least every
other round (the r04+r05 artifacts jointly covering all 64 is exactly
this invariant).

Output: sprintz_spark/registry_order.json — a JSON list of query names.
sprintz_spark.queries.queries() reorders its registry by this list at
call time (names missing from the list, i.e. added after the last
regeneration, go first: they are never-verified by definition).

Run after each round's CORRECTNESS_r{N}.json lands:
    python scripts/gen_rotation.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "sprintz_spark", "registry_order.json")


def load_history() -> dict[int, dict]:
    hist = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                hist[int(m.group(1))] = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
    return hist


def main() -> None:
    from sprintz_spark.queries import _hand_order

    hand = _hand_order()
    hist = load_history()
    latest = max(hist) if hist else 0
    last_green: dict[str, int] = {}
    for rnd, rows in sorted(hist.items()):
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                last_green[name] = rnd

    def staleness(name: str) -> int:
        # never driver-green sorts first (maximal staleness)
        return latest - last_green.get(name, -(10**6))

    order = sorted(hand, key=staleness, reverse=True)
    with open(OUT, "w") as f:
        json.dump(
            {
                "generated_from_rounds": sorted(hist),
                "latest_round": latest,
                "order": order,
            },
            f,
            indent=1,
        )
    head = order[:50]
    print(f"wrote {OUT}: {len(order)} entries, latest round r{latest:02d}")
    print(f"head-50 includes {sum(1 for n in head if n not in last_green)} never-green entries")
    stale_head = [n for n in head if staleness(n) >= 1]
    print(f"head-50 stale (>=1 round since green): {len(stale_head)}")
    tail = order[50:]
    if tail:
        print(f"tail ({len(tail)}): {', '.join(tail)}")


if __name__ == "__main__":
    main()
