#!/usr/bin/env python3
"""Scaling exponents from two bench_full.json sweeps.

alpha = log(t_hi / t_lo) / log(factor): 0 = flat (fixed-cost bound),
1 = linear in data. Usage:
  python3 tools/alpha_table.py <lo.json> <hi.json> <factor>
"""
import json
import math
import sys

lo = json.load(open(sys.argv[1]))["queries"]
hi = json.load(open(sys.argv[2]))["queries"]
factor = float(sys.argv[3])

rows = []
for k in sorted(set(lo) & set(hi)):
    a = math.log(hi[k] / lo[k]) / math.log(factor)
    rows.append((k, lo[k], hi[k], a))

rows.sort(key=lambda r: -r[3])
print(f"{'entry':34} {'t_lo':>8} {'t_hi':>9} {'alpha':>6}")
for k, tl, th, a in rows:
    print(f"{k:34} {tl:8.2f} {th:9.2f} {a:6.2f}")

tot_lo = sum(lo[k] for k, *_ in [(r[0],) for r in rows])
tot_hi = sum(hi[k] for k, *_ in [(r[0],) for r in rows])
print(f"\ncommon {len(rows)} entries: sum {tot_lo:.1f}s -> {tot_hi:.1f}s, "
      f"overall alpha {math.log(tot_hi / tot_lo) / math.log(factor):.2f}")
