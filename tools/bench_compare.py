#!/usr/bin/env python3
"""Compare two bench records on their shared query subset.

Usage: python3 tools/bench_compare.py <old.json> <new.json>

Prints the shared-subset totals and the per-query deltas beyond 25%,
excluding `_stage`/`_rest` bookkeeping entries. The subset total is the
round-over-round comparability statistic SURVEY quotes (new queries are
additive surface and excluded by construction).
"""
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def main(old_path: str, new_path: str) -> int:
    old, new = load(old_path), load(new_path)
    qo, qn = old["queries"], new["queries"]
    skip = {"_stage", "_rest", "_rest_n"}
    shared = sorted((set(qo) & set(qn)) - skip)
    to = sum(qo[q] for q in shared)
    tn = sum(qn[q] for q in shared)
    print(f"shared subset: {len(shared)} queries")
    print(f"old total {to:.1f}s -> new total {tn:.1f}s  ({tn / to:.2f}x)")
    print(f"old _stage {qo.get('_stage')}  new _stage {qn.get('_stage')}")
    only_new = sorted((set(qn) - set(qo)) - skip)
    if only_new:
        added = sum(qn[q] for q in only_new)
        print(f"new-only queries: {len(only_new)} totalling {added:.1f}s")
    print("per-query deltas >25% (shared, both >=0.5s):")
    for q in shared:
        a, b = qo[q], qn[q]
        if min(a, b) >= 0.5 and abs(b - a) / a > 0.25:
            print(f"  {q}: {a:.2f} -> {b:.2f}  ({b / a:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
