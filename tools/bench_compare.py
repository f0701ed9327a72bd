#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. BENCH_r1.json vs BENCH_r2.json).

Usage: python3 tools/bench_compare.py <old.json> <new.json> [threshold_pct]

Prints total delta and every query whose time moved more than threshold_pct
(default 30%) in either direction, so a round-over-round regression is
attributable to a specific operator.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.30
    print(f"total: {old['value']:.1f}s -> {new['value']:.1f}s "
          f"({(new['value'] - old['value']) / old['value'] * 100:+.1f}%)")
    for f in new.get("failed", []):
        print(f"  FAILED in new run: {f}")
    moved = []
    for q, t_new in new["queries"].items():
        t_old = old["queries"].get(q)
        if t_old is None:
            moved.append((q, None, t_new, "NEW"))
        elif t_old > 0.2 and abs(t_new - t_old) / t_old > thresh:
            moved.append((q, t_old, t_new, f"{(t_new - t_old) / t_old * 100:+.0f}%"))
    for q in old["queries"]:
        if q not in new["queries"]:
            moved.append((q, old["queries"][q], None, "REMOVED"))
    for q, t_old, t_new, tag in sorted(moved, key=lambda m: -(m[2] or 0)):
        o = f"{t_old:.2f}s" if t_old is not None else "--"
        n = f"{t_new:.2f}s" if t_new is not None else "--"
        print(f"  {q:30s} {o:>8s} -> {n:>8s}  {tag}")
    if not moved:
        print("  no query moved more than the threshold")


if __name__ == "__main__":
    main()
