"""Propose the next round's DRIVER_WINDOW rotation.

Reads every committed CORRECTNESS_r*.json (the driver-checked history),
keeps the family anchors (tests/test_entry.py::test_driver_window_
invariants), and fills the remaining slots with the oldest-added
oracle-bearing queries that have never earned a driver-green row.
Prints a ready-to-paste python tuple; the human still reviews it.

Usage: python scripts/rotate_window.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kaggle_ecommerce_etl_spark.queries import DRIVER_WINDOW, REGISTRY  # noqa: E402

ANCHORS = [
    "pricing_summary", "conflict_split_clean", "dedup_full_rows",
    "tolerant_numeric", "date_normalize", "month_datetime",
    "na_canonicalize", "pipeline_amazon_clean", "csv_roundtrip",
    "upsert_roundtrip", "ddl_roundtrip", "events_tumbling",
    "dedup_exact_docs", "minhash_signatures", "cosine_topk",
    "multimodal_metadata",
]


def main() -> None:
    checked: set[str] = set()
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        checked |= set(json.load(open(f)))
    never = [
        n
        for n in REGISTRY  # registry order ≈ age (insertion order)
        if n not in checked and REGISTRY[n][1] is not None
        and n not in ANCHORS
    ]
    slots = 50 - len(ANCHORS)
    window = ANCHORS + never[:slots]
    if len(window) < 50:  # tail exhausted: backfill with oldest checked
        pool = [n for n in REGISTRY
                if n not in window and REGISTRY[n][1] is not None]
        window += pool[: 50 - len(window)]
    print(f"# {len(never)} never-checked remain; proposing {len(window)} slots")
    print("DRIVER_WINDOW = (")
    for n in window:
        mark = "  # anchor" if n in ANCHORS else ""
        print(f'    "{n}",{mark}')
    print(")")
    unchanged = [n for n in window if n in DRIVER_WINDOW]
    print(f"# overlap with current window: {len(unchanged)}/50")


if __name__ == "__main__":
    main()
