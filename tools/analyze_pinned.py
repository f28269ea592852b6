#!/usr/bin/env python3
"""Summarize a pinned_scaling.sh log: per-level totals, stage minima,
and N->4N efficiencies (min-pairing and best single round)."""
import re, sys, collections

log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pinned_scaling.log"
tot = collections.defaultdict(dict)   # cores -> {round: total_sec}
stages = collections.defaultdict(lambda: collections.defaultdict(dict))
for line in open(log):
    m = re.search(r"tag=(r\d+) cores=(\d+) stage=(\w+) sec=([\d.]+)", line)
    if m:
        r, c, st, s = m.group(1), int(m.group(2)), m.group(3), float(m.group(4))
        stages[c][st][r] = s
    m = re.search(r"tag=(r\d+) cores=(\d+) total_sec=([\d.]+)", line)
    if m:
        tot[int(m.group(2))][m.group(1)] = float(m.group(3))

for c in sorted(tot):
    vals = tot[c]
    print(f"cores={c:3d} runs={len(vals)} min={min(vals.values()):7.2f} "
          f"med={sorted(vals.values())[len(vals)//2]:7.2f} max={max(vals.values()):7.2f}")
    for st in stages[c]:
        sv = stages[c][st]
        print(f"   stage {st:10s} min={min(sv.values()):7.2f} max={max(sv.values()):7.2f}")

def eff(lo, hi):
    if lo not in tot or hi not in tot: return
    lo_min, hi_min = min(tot[lo].values()), min(tot[hi].values())
    print(f"\n{lo} -> {hi} cores:")
    print(f"  min-pairing eff = {lo_min / (4 * hi_min):.3f} ({lo_min:.1f} -> {hi_min:.1f})")
    per_round = {r: tot[lo][r] / (4 * tot[hi][r])
                 for r in tot[lo] if r in tot[hi]}
    if per_round:
        best = max(per_round.items(), key=lambda kv: kv[1])
        print(f"  best single round = {best[1]:.3f} ({best[0]})")
        print("  per-round:", {k: round(v, 3) for k, v in sorted(per_round.items())})
    # stage-min composite: sum of per-stage minima at each level
    if stages[lo] and stages[hi]:
        slo = sum(min(v.values()) for v in stages[lo].values())
        shi = sum(min(v.values()) for v in stages[hi].values())
        print(f"  stage-min composite eff = {slo / (4 * shi):.3f} ({slo:.1f} -> {shi:.1f})")

eff(4, 16)
eff(8, 32)
eff(2, 8)
