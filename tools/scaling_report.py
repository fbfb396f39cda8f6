#!/usr/bin/env python3
"""Scaling-experiment report: compare two graft.Bench bench_full.json
runs (same binary, same settings, 1x vs Nx data from graft.ScaleUp) and
print the per-query scaling table PERF.md records.

Usage: scaling_report.py bench_1x.json bench_Nx.json FACTOR [MIN_SECS]

For each query: t1, tN, ratio tN/t1, and the scaling exponent
log(ratio)/log(FACTOR) — 1.0 = linear, <1 sub-linear (fixed overhead
dominates), >1 super-linear (flagged when ratio > FACTOR * 1.3).
Queries with t1 < MIN_SECS (default 0.15 s) are summarized, not listed:
at sub-150 ms the time is job-scheduling floor, not data.
"""
import json
import math
import sys


def main() -> int:
    p1, pn, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
    min_secs = float(sys.argv[4]) if len(sys.argv) > 4 else 0.15
    b1 = json.load(open(p1))
    bn = json.load(open(pn))
    q1, qn = b1["queries"], bn["queries"]
    shared = sorted(set(q1) & set(qn))
    rows = []
    for name in shared:
        t1, tn = q1[name], qn[name]
        if t1 <= 0:
            continue
        ratio = tn / t1
        expo = math.log(ratio) / math.log(factor) if ratio > 0 else float("nan")
        rows.append((name, t1, tn, ratio, expo))
    big = [r for r in rows if r[1] >= min_secs]
    small = [r for r in rows if r[1] < min_secs]
    big.sort(key=lambda r: -r[2])
    print(f"| query | t_1x (s) | t_{int(factor)}x (s) | ratio | exponent |")
    print("|---|---|---|---|---|")
    for name, t1, tn, ratio, expo in big:
        flag = " **super-linear**" if ratio > factor * 1.3 else ""
        print(f"| {name} | {t1:.2f} | {tn:.2f} | {ratio:.1f}x | "
              f"{expo:.2f}{flag} |")
    if small:
        rmax = max(r[3] for r in small)
        print(f"\n{len(small)} queries with t_1x < {min_secs} s (scheduling-"
              f"floor regime) omitted; worst ratio among them "
              f"{rmax:.1f}x = {max(r[2] for r in small):.2f} s absolute.")
    sup = [r[0] for r in big if r[3] > factor * 1.3]
    lin = sum(1 for r in big if r[3] <= factor * 1.3)
    print(f"\n{len(big)} queries above the floor: {lin} scale at <= "
          f"{factor * 1.3:.0f}x (exponent <= ~1.1); "
          f"super-linear: {sup if sup else 'none'}.")
    print(f"totals: {b1['total']:.1f} s -> {bn['total']:.1f} s "
          f"({bn['total'] / b1['total']:.1f}x) across {len(shared)} shared "
          f"queries; failed: 1x={list(b1['failed'])}, Nx={list(bn['failed'])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
