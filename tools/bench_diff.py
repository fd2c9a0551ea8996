#!/usr/bin/env python3
"""Mechanical bench-record comparison (r15 verdict #6): print every
query differing more than a threshold between two committed bench
records, so COVERAGE can paste the table instead of making prose
claims the JSON contradicts.

Usage: python3 tools/bench_diff.py A.json B.json [ratio=2.0]

Reads the per-query wall map (`queries`) and, when both records carry
it, the task-CPU map (`cpu_s`) — the noise-immune channel. Queries
missing or errored (-1) on either side are listed separately.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def diff_map(a, b, thr):
    rows, missing = [], []
    for q in sorted(set(a) | set(b)):
        va, vb = a.get(q, -1.0), b.get(q, -1.0)
        if va < 0 or vb < 0:
            missing.append((q, va, vb))
            continue
        ratio = max(va, vb) / max(min(va, vb), 1e-9)
        if ratio > thr:
            rows.append((ratio, q, va, vb))
    return sorted(rows, reverse=True), missing


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    pa, pb = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    ra, rb = load(pa), load(pb)
    for key, label in (("queries", "wall"), ("cpu_s", "cpu")):
        if key not in ra or key not in rb:
            print(f"[{label}] absent in one record — skipped")
            continue
        rows, missing = diff_map(ra[key], rb[key], thr)
        ta = sum(v for v in ra[key].values() if v >= 0)
        tb = sum(v for v in rb[key].values() if v >= 0)
        print(f"[{label}] totals: {ta:.1f} s ({pa}) vs {tb:.1f} s ({pb}); "
              f"{len(rows)} quer{'y' if len(rows) == 1 else 'ies'} "
              f"differ >{thr}x")
        for ratio, q, va, vb in rows:
            print(f"  {ratio:5.2f}x  {q:40s} {va:8.2f} -> {vb:8.2f}")
        for q, va, vb in missing:
            print(f"  (err)   {q:40s} {va:8.2f} -> {vb:8.2f}")


if __name__ == "__main__":
    main()
