#!/usr/bin/env python
"""Evidence report for the driver-priority rotation.

Reads every CORRECTNESS_r*.json in the repo root plus the current
registry and prints each query's external-evidence tier:

    tier 0  never externally hash-green (sampled-and-red or never sampled)
    tier N  latest green row is round N (older = weaker evidence)

Queries are listed weakest-first — the next round's `_DRIVER_PRIORITY`
front window (first 50 registry entries) should be filled in exactly
this order. Run after each round's CORRECTNESS file lands:

    python tools/rotation_report.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from b3_analytics_engine_spark.queries import _DRIVER_PRIORITY, registry

    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m:
            with open(path) as f:
                rounds[int(m.group(1))] = json.load(f)

    reg = list(registry())
    tiers: dict[str, tuple[int, int, list[int]]] = {}
    for name in reg:
        greens = [
            r for r, d in rounds.items()
            if name in d and d[name].get("hash_match")
        ]
        sampled = [r for r, d in rounds.items() if name in d]
        tiers[name] = (max(greens, default=0), len(greens), sampled)

    in_window = set(_DRIVER_PRIORITY)
    ordered = sorted(reg, key=lambda n: (tiers[n][0], tiers[n][1], n))
    print(f"{'query':34s} {'last_green':>10s} {'n_green':>7s} "
          f"{'sampled_rounds':>15s} window")
    for name in ordered:
        last, n, sampled = tiers[name]
        print(f"{name:34s} {last or '-':>10} {n:>7d} "
              f"{','.join(map(str, sampled)) or '-':>15s} "
              f"{'*' if name in in_window else ''}")

    weakest_50 = ordered[:50]
    stale_out = [n for n in weakest_50 if n not in in_window]
    extra_in = [n for n in _DRIVER_PRIORITY if n not in weakest_50]
    print(f"\nwindow size {len(_DRIVER_PRIORITY)}; "
          f"weakest-50 not in window: {len(stale_out)}")
    if stale_out:
        print("  consider swapping IN :", ", ".join(stale_out))
        print("  consider swapping OUT:", ", ".join(extra_in[: len(stale_out)]))


if __name__ == "__main__":
    main()
