#!/usr/bin/env python3
"""Regenerate the PLANS.md per-query table from bench/latest.json.

Prints the two-column markdown table (descending by min-of-samples
seconds) to stdout; paste it over the existing table block.
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "bench/latest.json"
d = json.load(open(path))
qs = sorted(d["queries"].items(), key=lambda kv: -kv[1])
half = (len(qs) + 1) // 2
left, right = qs[:half], qs[half:]
print("| Query | s | Query | s |")
print("|---|---|---|---|")
for i in range(half):
    l = f"| {left[i][0]} | {left[i][1]:.2f} |"
    r = f" {right[i][0]} | {right[i][1]:.2f} |" if i < len(right) else "  |  |"
    print(l + r)
print(f"\ntotal: {d['value']:.1f} s over {len(qs)} queries", file=sys.stderr)
