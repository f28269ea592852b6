#!/usr/bin/env python3
"""Summarize local-cluster scaling + same-mode control logs into the
BENCH/BASELINE.md §0b tables: per-level minima across interleaved
rounds; strong-scaling efficiency = T_low / (4 * T_high), weak-scaling
efficiency = T_low(corpus/4 on 1 worker) / T_high(corpus on 4 workers).
Job samples next to the platform controls measured at the same core
sets."""
import re, collections

def tag_samples(path, pat):
    rows = collections.defaultdict(list)
    for line in open(path):
        m = re.search(pat, line)
        if m:
            key = re.sub(r"_(r|w)\d+$", "", m.group("tag"))
            rows[key].append(float(m.group("sec")))
    return rows

def main():
    job = tag_samples("BENCH/logs/cluster_scaling_fine.log",
                      r"tag=(?P<tag>\S+) workers=\d+ cores=\d+ total_sec=(?P<sec>[\d.]+)")
    ctl = collections.defaultdict(list)
    for line in open("BENCH/logs/cluster_control.log"):
        m = re.search(r"tag=(?P<tag>\S+) phase=(?P<phase>\S+) .* max_sec=(?P<sec>[\d.]+)", line)
        if m:
            ctl[(m.group("tag").rsplit("_r", 1)[0], m.group("phase"))].append(float(m.group("sec")))

    def fmt(xs):
        return "[" + ", ".join(f"{x:.1f}" for x in sorted(xs)) + "]"

    print("== strong scaling (1 vs 4 executor JVMs, same corpus; eff = low/(4*high)) ==")
    for lvl in ["F1", "F2"]:
        lo, hi = job.get(f"{lvl}low", []), job.get(f"{lvl}high", [])
        if lo and hi:
            print(f"{lvl}: low min {min(lo):.2f}s {fmt(lo)} | high min {min(hi):.2f}s {fmt(hi)}"
                  f" | eff {min(lo)/(4*min(hi)):.3f}")
    print("\n== weak scaling (1 JVM on corpus/4 vs 4 JVMs on corpus; eff = low/high) ==")
    for lvl, hi_tag in [("W1", "F1high"), ("W2", "F2high")]:
        lo, hi = job.get(f"{lvl}low", []), job.get(hi_tag, [])
        if lo and hi:
            print(f"{lvl}: low min {min(lo):.2f}s {fmt(lo)} | high min {min(hi):.2f}s {fmt(hi)}"
                  f" | eff {min(lo)/min(hi):.3f}")
    print("\n== control (1 vs 4 pinned probe JVMs, per-level minima) ==")
    for lvl in ["C1", "C2"]:
        for ph in ["jvmcpu", "memcopy"]:
            lo, hi = ctl.get((f"{lvl}low", ph), []), ctl.get((f"{lvl}high", ph), [])
            if lo and hi:
                print(f"{lvl} {ph}: low min {min(lo):.2f}s | high min {min(hi):.2f}s"
                      f" | eff {min(lo)/(4*min(hi)):.3f}")

if __name__ == "__main__":
    main()
