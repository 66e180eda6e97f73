#!/usr/bin/env python3
"""Refresh the committed BENCH_local.json from an interleaved bench
pair — the only sanctioned write path for the round bench artifact.

Usage: python3 tools/bench_refresh.py <run1.json> <run2.json> [out.json]

Round 7 shipped a contended-box artifact (139 s incl. a 44.8 s _stage
vs the definitive 66.9 s + 17.4 s pair measured minutes earlier)
because any ad-hoc `runMain graft.Bench` overwrote BENCH_local.json in
place. This script is the replacement contract:

 1. VARIANCE gate — the pair must agree per-query within 25%
    (tools/bench_variance.py semantics, shared noise floor); a pair
    that disagrees is a contended box, not a measurement.
 2. DEGRADED-BOX gate — the pair's min `_stage` must not exceed 2x the
    trailing median of previously ACCEPTED `_stage` values
    (tools/bench_stage_history.json, capped at the last 10). _stage is
    pure warm-up (first-touch JIT, codegen, first parquet reads) and
    is byte-identical work run-over-run, so a 2x jump fingerprints a
    degraded box even when query minima look plausible.
 3. On pass: write the PER-QUERY MIN across the pair (min _stage,
    total = sum of mins) — min-of-pair extends Bench's own min-of-N
    rationale (noise here is strictly one-sided) across two runs
    minutes apart — and append the accepted _stage to the history.

Exit 1 (and leave the artifact untouched) on any gate failure.
"""
import json
import os
import statistics
import sys

HISTORY = os.path.join(os.path.dirname(__file__), "bench_stage_history.json")
STAGE_FACTOR = 2.0
VARIANCE_TOL = 0.25
NOISE_FLOOR = 0.5  # seconds; below it scheduler jitter dominates


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def variance_ok(qa: dict, qb: dict) -> bool:
    fails = []
    for q in sorted((set(qa) & set(qb)) - {"_stage"}):
        va, vb = qa[q], qb[q]
        if va < 0 or vb < 0:
            fails.append((q, va, vb, float("inf")))
            continue
        if min(va, vb) < NOISE_FLOOR:
            continue
        rel = abs(va - vb) / min(va, vb)
        if rel > VARIANCE_TOL:
            fails.append((q, va, vb, rel))
    for q, va, vb, rel in fails:
        print(f"REFUSE variance {q}: {va:.2f}s vs {vb:.2f}s ({rel * 100:.0f}%)")
    return not fails


def main() -> int:
    a, b = load(sys.argv[1]), load(sys.argv[2])
    out = sys.argv[3] if len(sys.argv) > 3 else "BENCH_local.json"
    qa, qb = a["queries"], b["queries"]

    if not variance_ok(qa, qb):
        print("REFUSED: pair disagreement says contended box — rerun the pair")
        return 1

    stage = min(qa.get("_stage", 0.0), qb.get("_stage", 0.0))
    history = []
    if os.path.exists(HISTORY):
        with open(HISTORY) as f:
            history = json.load(f)
    if history:
        med = statistics.median(history)
        if stage > STAGE_FACTOR * med:
            print(f"REFUSED: _stage {stage:.1f}s > {STAGE_FACTOR}x trailing "
                  f"median {med:.1f}s of {len(history)} accepted runs — "
                  "degraded box")
            return 1

    merged = {}
    for q in sorted(set(qa) | set(qb)):
        if q == "_stage":
            continue
        va, vb = qa.get(q), qb.get(q)
        vals = [v for v in (va, vb) if v is not None]
        # an errored run (-1) must stay visible, never be min'd away
        merged[q] = -1.0 if any(v < 0 for v in vals) else min(vals)
    total = sum(v for v in merged.values() if v >= 0) + stage
    rec = {
        "metric": "total",
        "value": round(total, 2),
        "unit": "sec",
        "queries": {"_stage": round(stage, 2),
                    **{k: round(v, 2) for k, v in merged.items()}},
        "sf": a.get("sf"),
    }
    with open(out, "w") as f:
        json.dump(rec, f, separators=(",", ":"))
        f.write("\n")
    with open(HISTORY, "w") as f:
        json.dump((history + [round(stage, 2)])[-10:], f)
    n_err = sum(1 for v in merged.values() if v < 0)
    print(f"ACCEPTED: {out} <- pair min, total={rec['value']}s "
          f"(_stage {stage:.1f}s, {len(merged)} queries, {n_err} errored)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
