#!/usr/bin/env python3
"""Compare two bench records (JSON lines from graft.Bench) and check
per-query reproducibility.

Usage: python3 tools/bench_variance.py <run1.json> <run2.json> [tol_pct]

A query FAILS the check when both runs are above the noise floor
(0.5 s — below that, scheduler jitter dominates and absolute deltas
are centiseconds) and the relative delta exceeds tol_pct (default 25).
`_stage` is excluded: it is the warm-up line item, first-touch by
definition. Exit 1 when any query fails — the committed variance gate
behind the round-5 verdict's "per-query numbers must be reproducible
across back-to-back runs of the same code".
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        rec = json.loads(f.read().strip().splitlines()[-1])
    return rec["queries"]


def main() -> int:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    tol = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.25
    common = sorted((set(a) & set(b)) - {"_stage"})
    worst, fails = 0.0, 0
    for q in common:
        va, vb = a[q], b[q]
        if va < 0 or vb < 0:
            print(f"FAIL {q}: errored run ({va}, {vb})")
            fails += 1
            continue
        if min(va, vb) < 0.5:
            continue  # under the noise floor
        # records are printed at 1-2 decimals — deduct the worst-case
        # quantization (±half an ulp of the printed precision per side)
        # so the gate measures variance, not rounding
        def quant(v: float) -> float:
            return 0.005 if abs(round(v, 2) - v) < 1e-9 else 0.05
        rel = max(0.0, abs(va - vb) - quant(va) - quant(vb)) / min(va, vb)
        worst = max(worst, rel)
        mark = "FAIL" if rel > tol else "ok  "
        if rel > tol:
            fails += 1
        if rel > tol or rel > 0.15:
            print(f"{mark} {q}: {va:.2f}s vs {vb:.2f}s ({rel * 100:.0f}%)")
    print(f"{len(common)} common queries, worst rel delta "
          f"{worst * 100:.0f}%, {fails} over the {tol * 100:.0f}% gate")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
