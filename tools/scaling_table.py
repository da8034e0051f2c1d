#!/usr/bin/env python3
"""Build the SURVEY §6 scaling table from two Bench JSON captures.

Usage: tools/scaling_table.py <bench_sf0.1.json> <bench_sf1.json> [factor]

Prints a markdown table of per-query t(sf1)/t(sf0.1) ratios sorted worst
first, flagging ratios above the superlinear threshold (1.5x the data
factor, i.e. 15 for a 10x step).
"""
import json
import sys

lo = json.load(open(sys.argv[1]))
hi = json.load(open(sys.argv[2]))
factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
thresh = 1.5 * factor

rows = []
for q, t_lo in lo["queries"].items():
    t_hi = hi["queries"].get(q)
    if t_hi is None:
        continue
    rows.append((q, t_lo, t_hi, t_hi / t_lo))
rows.sort(key=lambda r: -r[3])

print("| query | t(sf0.1) s | t(sf1) s | ratio | note |")
print("|---|---|---|---|---|")
for q, a, b, r in rows:
    note = "**superlinear**" if r > thresh else ""
    print(f"| {q} | {a:.2f} | {b:.2f} | {r:.1f}x | {note} |")
tot_lo = sum(r[1] for r in rows)
tot_hi = sum(r[2] for r in rows)
print(f"| _total_ | {tot_lo:.1f} | {tot_hi:.1f} | "
      f"{tot_hi / tot_lo:.1f}x |  |")
print(f"\nfailed at sf1: {hi.get('failed', [])}", file=sys.stderr)
