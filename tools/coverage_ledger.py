"""Cumulative driver-graded coverage ledger.

The driver grades the FIRST 50 registry entries per round
(CORRECTNESS_r{N}.json); the window rotates each round so coverage
accumulates.  This tool reads every CORRECTNESS_r*.json plus the current
registry and prints:

* cumulative green set (hash-pass in any round),
* what the CURRENT first-50 window would add,
* the never-green remainder — the candidate pool for the next rotation.

Usage: python tools/coverage_ledger.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from queue_system_simulator_spark.plans import QUERIES  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        for name, rec in json.load(open(f)).items():
            if (
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match")
            ):
                green.add(name)
    names = list(QUERIES)
    window = names[:50]
    window_new = [n for n in window if n not in green]
    never = [n for n in names if n not in green and n not in window]
    print(f"registered: {len(names)}  cumulative green: {len(green)}")
    print(f"current window adds (if green): {len(window_new)}")
    for n in window_new:
        print(f"  + {n}")
    print(f"never-green outside the window: {len(never)}")
    for n in never:
        has_oracle = QUERIES[n].oracle is not None
        print(f"  - {n}{'' if has_oracle else '  [rows-only]'}")


if __name__ == "__main__":
    main()
