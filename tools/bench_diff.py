#!/usr/bin/env python3
"""Compare two BENCH_DETAIL.json files: per-query ratio, sorted movers.

Usage: python3 tools/bench_diff.py BEFORE.json AFTER.json [threshold]
"""
import json
import sys


def main() -> None:
    a = json.load(open(sys.argv[1]))
    b = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    ta = sum(qa[k] for k in shared)
    tb = sum(qb[k] for k in shared)
    print(f"shared {len(shared)} queries: before {ta:.1f}s after {tb:.1f}s "
          f"ratio {tb/ta:.3f}")
    only_a = set(qa) - set(qb)
    only_b = set(qb) - set(qa)
    if only_a:
        print("removed:", sorted(only_a))
    if only_b:
        print("added:", sorted(only_b))
    movers = [(qb[k] / qa[k] if qa[k] > 0 else float("inf"), qa[k], qb[k], k)
              for k in shared]
    ups = [m for m in movers if m[0] >= thr and m[2] > 0.3]
    downs = [m for m in movers if m[0] <= 1 / thr and m[1] > 0.3]
    print(f"\nup >= {thr}x ({len(ups)}):")
    for r, x, y, k in sorted(ups, reverse=True):
        print(f"  {r:5.2f}  {x:6.2f} -> {y:6.2f}  {k}")
    print(f"\ndown <= {1/thr:.2f}x ({len(downs)}):")
    for r, x, y, k in sorted(downs):
        print(f"  {r:5.2f}  {x:6.2f} -> {y:6.2f}  {k}")


if __name__ == "__main__":
    main()
