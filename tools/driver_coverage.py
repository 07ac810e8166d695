#!/usr/bin/env python3
"""Per-round driver-verification manifest.

The driver hashes the FIRST 50 entries of ``queries()`` each round
(CORRECTNESS_r{N}.json).  This tool reports which queries have been
driver-verified in which rounds, and which remain driver-unverified, so the
registry can be rotated every round to maximize driver coverage (round-4
verdict ask #1).

Usage: python tools/driver_coverage.py [--next-50]
  --next-50  print the 50 registry keys the driver will sample next round
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_order() -> list[str]:
    src = open(os.path.join(REPO, "__spark_entry__.py")).read()
    m = re.search(
        r"def queries\(\).*?return \{(.*?)\n    \}", src, re.S
    )
    return re.findall(r'"([a-z0-9_]+)":', m.group(1))


def rounds() -> dict[int, list[str]]:
    out = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        n = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        out[n] = list(json.load(open(path)))
    return out


def main() -> None:
    order = registry_order()
    per_round = rounds()
    verified: dict[str, list[int]] = {}
    for n, keys in per_round.items():
        for k in keys:
            verified.setdefault(k, []).append(n)
    if "--next-50" in sys.argv:
        for k in order[:50]:
            print(k)
        return
    never = [k for k in order if k not in verified]
    print(f"registry: {len(order)} queries")
    for n, keys in sorted(per_round.items()):
        fresh = sum(1 for k in keys if min(verified[k]) == n)
        print(f"  round {n}: sampled {len(keys)} ({fresh} first-time)")
    print(f"driver-verified at least once: {len(verified)}/{len(order)}")
    print(f"never driver-verified: {len(never)}")
    nxt = order[:50]
    fresh_next = sum(1 for k in nxt if k not in verified)
    print(f"next-round sample (first 50 in registry order): {fresh_next} first-time")
    if never:
        print("never-verified keys (registry order):")
        for k in never:
            print(f"  {k}")


if __name__ == "__main__":
    main()
