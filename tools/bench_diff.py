#!/usr/bin/env python3
"""Round-over-round bench comparison: per-query min-of-k ratios between
two BENCH_full_r{N}.json artifacts, with regressions flagged.

Usage: python3 tools/bench_diff.py <old.json> <new.json> [threshold]

Compares the `queries` (min-of-k) maps. A query is flagged as a
regression when new/old > threshold (default 1.5) AND the absolute
delta exceeds 0.2 s (sub-200ms queries live inside scheduling noise —
PERF.md's documented ambient spread). Queries present on only one side
are listed separately. Exit code 1 when regressions are found, so a
round-close script can gate on it.

Driver-side python only — not part of the library.
"""
import json
import signal
import sys

# die quietly when piped into head instead of tracebacking on SIGPIPE
signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    qo, qn = old.get("queries", {}), new.get("queries", {})
    noisy = set(old.get("noisy", [])) | set(new.get("noisy", []))
    common = sorted(set(qo) & set(qn))
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    regressions, improvements = [], []
    for q in common:
        a, b = qo[q], qn[q]
        if a <= 0:
            continue
        r = b / a
        if r > thresh and b - a > 0.2:
            regressions.append((q, a, b, r, q in noisy))
        elif r < 1 / thresh and a - b > 0.2:
            improvements.append((q, a, b, r))
    print(f"old: {old.get('total')}s / {len(qo)} queries   "
          f"new: {new.get('total')}s / {len(qn)} queries   "
          f"common: {len(common)}")
    ratios = sorted(qn[q] / qo[q] for q in common if qo[q] > 0)
    if ratios:
        n = len(ratios)
        med = (ratios[n // 2] if n % 2 == 1
               else (ratios[n // 2 - 1] + ratios[n // 2]) / 2)
        print(f"median per-query ratio: {med:.2f}")
    if only_new:
        print(f"\nnew queries ({len(only_new)}): {', '.join(only_new)}")
    if only_old:
        print(f"\nremoved queries ({len(only_old)}): {', '.join(only_old)}")
    if improvements:
        print(f"\nimprovements (< 1/{thresh}x and > 0.2 s faster):")
        for q, a, b, r in sorted(improvements, key=lambda x: x[3]):
            print(f"  {q}: {a:.2f} -> {b:.2f} s ({r:.2f}x)")
    if regressions:
        print(f"\nREGRESSIONS (> {thresh}x and > 0.2 s slower):")
        for q, a, b, r, n in sorted(regressions, key=lambda x: -x[3]):
            tag = " [noisy — re-measure before acting]" if n else ""
            print(f"  {q}: {a:.2f} -> {b:.2f} s ({r:.2f}x){tag}")
        return 1
    print("\nno regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
