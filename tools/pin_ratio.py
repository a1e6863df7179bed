#!/usr/bin/env python3
"""Common-query min-to-min ratio between two BENCH_LOCAL pins — the
round-end protocol's required statement (sum of per-query minima over the
intersection of the two pins' query sets, new / old)."""
import json
import sys

old, new = (json.load(open(p)) for p in sys.argv[1:3])
om, nm = old["queries_min"], new["queries_min"]
common = sorted(set(om) & set(nm))
so, sn = sum(om[q] for q in common), sum(nm[q] for q in common)
print(f"common {len(common)} queries: old {so:.1f}s new {sn:.1f}s "
      f"ratio {sn / so:.3f}")
print(f"old pin: {len(om)} queries min_total {old['min_total']:.1f}s; "
      f"new pin: {len(nm)} queries min_total {new['min_total']:.1f}s; "
      f"new-only min-sum {sum(nm[q] for q in set(nm) - set(om)):.1f}s")
moved = sorted(common, key=lambda q: abs(nm[q] - om[q]), reverse=True)[:6]
for q in moved:
    print(f"  moved {q}: {om[q]:.2f} -> {nm[q]:.2f}")
