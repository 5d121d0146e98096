#!/usr/bin/env python3
"""Growth table for the sf1 evidence run: per-query wall growth of an
sf1 bench artifact vs the committed sf0.1 artifact (BENCH_RESULT.json).

Usage: python3 tools/growth_table.py <bench_sf1.json> [bench_sf01.json]

Prints median/p90 growth, the >x12 outlier rows, and a compact
markdown-ready table of the biggest movers. Queries present in only one
artifact are listed separately (new gates have no sf0.1 twin until the
committed artifact is refreshed).
"""
import json
import statistics
import sys


def load(path):
    j = json.load(open(path))
    return j["queries"], j


def main(sf1_path, base_path="BENCH_RESULT.json"):
    q1, j1 = load(sf1_path)
    q0, j0 = load(base_path)
    common = sorted(set(q1) & set(q0))
    growth = {q: (q1[q] / q0[q] if q0[q] > 0 else float("inf")) for q in common}
    vals = sorted(growth.values())
    print(f"sf1 artifact: {sf1_path}  total={j1.get('value'):.1f}s "
          f"queries={len(q1)}")
    print(f"base artifact: {base_path}  total={j0.get('value'):.1f}s "
          f"queries={len(q0)}")
    print(f"common={len(common)}  median growth x{statistics.median(vals):.2f}  "
          f"p90 x{vals[int(len(vals)*0.9)]:.2f}  max x{vals[-1]:.2f}")
    outliers = sorted((g, q) for q, g in growth.items() if g > 12)
    print(f"\n>x12 outliers: {len(outliers)}")
    for g, q in reversed(outliers):
        print(f"  {q:30s} {q0[q]:7.2f}s -> {q1[q]:8.2f}s  x{g:.1f}")
    print("\ntop 15 movers:")
    for q, g in sorted(growth.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {q:30s} {q0[q]:7.2f}s -> {q1[q]:8.2f}s  x{g:.1f}")
    only1 = sorted(set(q1) - set(q0))
    if only1:
        print(f"\nonly in sf1 artifact ({len(only1)}): {', '.join(only1)}")


if __name__ == "__main__":
    main(*sys.argv[1:])
