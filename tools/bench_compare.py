"""Compare two bench result JSONs (BENCH_r{N}.json driver records or a
raw `python bench.py` stdout line) per query; print a regression table
of queries slower than --threshold x (default 1.5) plus the biggest
improvements. Pure python — safe to run next to nothing."""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver record wraps the bench line
        d = d["parsed"]
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    regress, improve = [], []
    for q in shared:
        a, b = oq[q], nq[q]
        if a <= 0:
            continue
        r = b / a
        if r >= args.threshold and b - a > 0.15:
            regress.append((r, q, a, b))
        elif r <= 1 / args.threshold and a - b > 0.15:
            improve.append((r, q, a, b))
    print(f"shared queries: {len(shared)}  "
          f"old total {sum(oq[q] for q in shared):.1f}s  "
          f"new total {sum(nq[q] for q in shared):.1f}s")
    print(f"\nregressions >= {args.threshold}x ({len(regress)}):")
    for r, q, a, b in sorted(regress, reverse=True):
        print(f"  {q:32s} {a:7.3f}s -> {b:7.3f}s  ({r:.2f}x)")
    print(f"\nimprovements <= {1/args.threshold:.2f}x ({len(improve)}):")
    for r, q, a, b in sorted(improve):
        print(f"  {q:32s} {a:7.3f}s -> {b:7.3f}s  ({r:.2f}x)")
    op, np_ = old.get("pipeline", {}), new.get("pipeline", {})
    if op and np_:
        print("\npipeline:")
        for k in ("scaling_efficiency", "peak_turns_per_sec_local32"):
            print(f"  {k}: {op.get(k)} -> {np_.get(k)}")
        os_, ns = op.get("strong_scaling", {}), np_.get("strong_scaling", {})
        print(f"  strong_scaling_efficiency: "
              f"{os_.get('scaling_efficiency')} -> "
              f"{ns.get('scaling_efficiency')}")


if __name__ == "__main__":
    sys.exit(main())
