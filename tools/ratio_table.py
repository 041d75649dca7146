#!/usr/bin/env python3
"""Dev-only scale-ratio table: derives the STATUS sf1/sf0.1 table from
the two COMMITTED bench artifacts, so the headline claim is
byte-reproducible by anyone holding the repo.

Usage: python3 tools/ratio_table.py BENCH_sf1_rN.json bench_close_rN.json
"""
import json
import sys


def main(sf1_path: str, sf01_path: str) -> int:
    sf1 = json.load(open(sf1_path))["queries"]
    sf01 = json.load(open(sf01_path))["queries"]
    common = sorted(set(sf1) & set(sf01))
    rows = []
    for q in common:
        a, b = sf01[q], sf1[q]
        if isinstance(a, (int, float)) and isinstance(b, (int, float)) and a > 0:
            rows.append((b / a, q, a, b))
    rows.sort(reverse=True)
    print(f"common queries: {len(rows)}  "
          f"(sf1-only: {sorted(set(sf1) - set(sf01))}, "
          f"sf0.1-only: {sorted(set(sf01) - set(sf1))})")
    over7 = [r for r in rows if r[0] >= 7.0]
    over4 = [r for r in rows if r[0] >= 4.0]
    print(f"ratios >= 7x: {len(over7)}   ratios >= 4x: {len(over4)}")
    print(f"{'ratio':>7}  {'sf0.1 s':>8}  {'sf1 s':>8}  query")
    for ratio, q, a, b in rows[:25]:
        print(f"{ratio:7.2f}  {a:8.2f}  {b:8.2f}  {q}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
