#!/usr/bin/env python3
"""Refresh the committed BENCH_local.json from N interleaved bench runs
— the only sanctioned write path for the round bench artifact.

Usage: python3 tools/bench_refresh.py <run1.json> <run2.json> [run3.json ...] [--out out.json]

Round 7 shipped a contended-box artifact (139 s incl. a 44.8 s _stage
vs the definitive 66.9 s + 17.4 s pair measured minutes earlier)
because any ad-hoc `runMain graft.Bench` overwrote BENCH_local.json in
place. The round-8 revision generalizes the original two-run contract
to N runs, because this box's contention cycles (~20-40 min, measured
across 7 runs in one afternoon) make two fully-clean 12-minute windows
rare while five runs spread over hours confirm 110/111 query minima
within 25%:

 1. CONFIRMED-MINIMUM rule — a query's reported value is the SMALLEST
    observation that a second, independent run replicates within 25%
    (runs are minutes-to-hours apart; wall-clock noise is strictly
    one-sided, so the smallest replicated value estimates the
    noise-free cost and every published number is reproduced by
    construction). Sub-0.5 s minima skip the confirmation (scheduler
    jitter dominates below the floor). A query with NO two
    observations within 25% of each other refuses the refresh — that
    is not a measurement.
 2. DEGRADED-BOX gate — the min `_stage` across runs must not exceed
    2x the trailing median of previously ACCEPTED `_stage` values
    (tools/bench_stage_history.json, capped at the last 10). _stage is
    byte-identical work run-over-run, so a 2x jump fingerprints a
    degraded box even when query minima look plausible.
 3. On pass: write per-query confirmed minima (min `_stage`, total =
    sum + stage) and append the accepted `_stage` to the history.

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


def confirmed_min(vals: list) -> float:
    """Smallest value replicated by another observation within 25%;
    None if no two observations agree (pure contention, not data)."""
    vs = sorted(vals)
    if vs[0] < NOISE_FLOOR:
        return vs[0]
    # sorted, so only the immediate neighbor can be within tolerance
    for v, w in zip(vs, vs[1:]):
        if (w - v) / v <= VARIANCE_TOL:
            return v
    return None


def main() -> int:
    args = sys.argv[1:]
    out = "BENCH_local.json"
    if "--out" in args:
        i = args.index("--out")
        out = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 2:
        print("need at least two run files")
        return 1
    runs = [load(a) for a in args]
    qsets = [set(r["queries"]) - {"_stage"} for r in runs]
    shared = set.intersection(*qsets)
    union = set.union(*qsets)
    if shared != union:
        print(f"REFUSED: runs disagree on the query set: {union - shared}")
        return 1

    merged, unconfirmed = {}, []
    for q in sorted(shared):
        vals = [r["queries"][q] for r in runs]
        if any(v < 0 for v in vals):
            merged[q] = -1.0  # an errored run must stay visible
            continue
        cm = confirmed_min(vals)
        if cm is None:
            unconfirmed.append((q, sorted(round(v, 2) for v in vals)))
        else:
            merged[q] = cm
    for q, vals in unconfirmed:
        print(f"REFUSE unconfirmed {q}: no two of {vals} within "
              f"{VARIANCE_TOL * 100:.0f}%")
    if unconfirmed:
        print("REFUSED: contended box on the queries above — add runs")
        return 1

    stage = min(r["queries"].get("_stage", 0.0) for r in runs)
    history = []
    if os.path.exists(HISTORY):
        with open(HISTORY) as f:
            history = json.load(f)
    if history:
        med = statistics.median(history)
        if stage > STAGE_FACTOR * med:
            # Legit-growth escape hatch (round 11): the gate exists to
            # catch DEGRADED BOXES, whose contention varies run to run.
            # Genuinely larger staged work (new FrameCache artifacts)
            # is STABLE across runs minutes apart — accept it only on
            # >= 3 runs whose stages all agree within the variance
            # tolerance, and say so loudly; history then adapts.
            stages = sorted(r["queries"].get("_stage", 0.0) for r in runs)
            stable = (len(runs) >= 3 and stages[0] > 0 and
                      (stages[-1] - stages[0]) / stages[0] <= VARIANCE_TOL)
            if stable:
                print(f"NOTE: _stage {stage:.1f}s exceeds {STAGE_FACTOR}x "
                      f"trailing median {med:.1f}s but is STABLE across "
                      f"{len(runs)} runs ({stages}) — accepting as grown "
                      "staged work, not contention")
            else:
                print(f"REFUSED: _stage {stage:.1f}s > {STAGE_FACTOR}x trailing "
                      f"median {med:.1f}s of {len(history)} accepted runs — "
                      "degraded box (or grown staged work: confirm with >= 3 "
                      "stage-stable runs)")
                return 1

    total = sum(v for v in merged.values() if v >= 0) + stage
    rec = {
        "metric": "total",
        "value": round(total, 2),
        "unit": "sec",
        "queries": {"_stage": round(stage, 2),
                    **{k: round(v, 2) for k, v in merged.items()}},
        "sf": runs[0].get("sf"),
    }
    with open(out, "w") as f:
        json.dump(rec, f, separators=(",", ":"))
        f.write("\n")
    # the accepted-stage history backs the degraded-box gate for the
    # CANONICAL artifact only — experimental --out refreshes must not
    # shift the trailing median the gate compares against
    canonical = os.path.join(os.path.dirname(HISTORY), "..", "BENCH_local.json")
    if os.path.realpath(out) == os.path.realpath(canonical):
        with open(HISTORY, "w") as f:
            json.dump((history + [round(stage, 2)])[-10:], f)
    n_err = sum(1 for v in merged.values() if v < 0)
    print(f"ACCEPTED: {out} <- confirmed minima over {len(runs)} runs, "
          f"total={rec['value']}s (_stage {stage:.1f}s, {len(merged)} "
          f"queries, {n_err} errored)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
