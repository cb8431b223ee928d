"""Propose the next round's DRIVER_WINDOW rotation.

Reads every committed CORRECTNESS_r*.json (repo-root anchored, so the
script works from any cwd), counts a query as driver-checked only if
its row was GREEN (rows/schema/hash all matched, no error), keeps the
family anchors (queries.WINDOW_ANCHORS — the same source of truth the
window-invariants test asserts), excludes the CURRENT window (its
entries get checked this round), and fills the remaining slots with
the oldest-added oracle-bearing queries that have never earned a
driver-green row. Once the never-green tail is exhausted (the r8
endgame), remaining slots re-verify OLDEST-DRIVER-STAMP-FIRST: each
query's most recent green round is tracked, the current window counts
as about-to-be-stamped this round, and the stalest stamps get the
slots — so driver coverage ages uniformly instead of by registry
insertion order (VERDICT r7 next-round #6). Prints a ready-to-paste
python tuple; the human still reviews it.

Usage: python scripts/rotate_window.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kaggle_ecommerce_etl_spark.queries import (  # noqa: E402
    DRIVER_WINDOW,
    REGISTRY,
    WINDOW_ANCHORS,
)


def _green(row: dict) -> bool:
    return (
        row.get("rows_match")
        and row.get("schema_match")
        # rows-only entries carry no hash; missing hash_match is fine
        and row.get("hash_match", True)
        and not row.get("err")
    )


def main() -> None:
    checked: set[str] = set()
    last_green: dict[str, int] = {}  # query -> newest driver-green round
    latest: dict = {}
    cur_round = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnum = int(re.search(r"CORRECTNESS_r(\d+)", f).group(1))
        cur_round = max(cur_round, rnum)
        latest = json.load(open(f))
        for name, row in latest.items():
            if _green(row):
                checked.add(name)
                last_green[name] = max(last_green.get(name, 0), rnum)
    # If the newest CORRECTNESS file already covers the current window,
    # that window has been adjudicated — its RED rows (e.g. the r5
    # embedding_quantize comparator crash) must re-enter the pool so
    # the fix gets a fresh driver slot. Only when the window has NOT
    # been checked yet (mid-round regeneration) do we exclude it
    # wholesale, or the same entries get re-proposed forever; those
    # entries also count as about-to-be-stamped THIS round for the
    # oldest-stamp backfill ordering below.
    if not set(DRIVER_WINDOW) <= set(latest):
        checked |= set(DRIVER_WINDOW)
        for n in DRIVER_WINDOW:
            last_green[n] = cur_round + 1
    anchors = list(WINDOW_ANCHORS)
    never = [
        n
        for n in REGISTRY
        if n not in checked and REGISTRY[n][1] is not None
        and n not in anchors
    ]
    slots = 50 - len(anchors)
    window = anchors + never[:slots]
    if len(window) < 50:  # tail exhausted: backfill oldest-stamp-first
        order = {n: i for i, n in enumerate(REGISTRY)}
        pool = sorted(
            (n for n in REGISTRY
             if n not in window and REGISTRY[n][1] is not None),
            key=lambda n: (last_green.get(n, 0), order[n]),
        )
        window += pool[: 50 - len(window)]
    print(f"# {len(never)} never-green remain; proposing {len(window)} slots")
    print("DRIVER_WINDOW = (")
    for n in window:
        if n in anchors:
            mark = "  # anchor"
        elif n in never:
            mark = "  # never-green tail"
        else:
            mark = f"  # re-verify (last driver stamp r{last_green.get(n, 0)})"
        print(f'    "{n}",{mark}')
    print(")")
    unchanged = [n for n in window if n in DRIVER_WINDOW]
    print(f"# overlap with current window: {len(unchanged)}/50")


if __name__ == "__main__":
    main()
