#!/usr/bin/env python3
"""Refresh the committed BENCH_local.json from N interleaved bench runs
— the only sanctioned write path for the round bench artifact.

Usage: python3 tools/bench_refresh.py <run1.json> <run2.json> [run3.json ...]
           [--out out.json] [--accept-grown-stage]

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

    Grown-stage escape hatch (round 11, load-corroborated round 12):
    genuinely larger staged work (new FrameCache artifacts) is stable
    across runs, but this box's contention cycles run 20-40 min — three
    interleaved runs can fit inside one cycle, so stage STABILITY alone
    cannot distinguish steady co-tenant load from grown work. Round 12
    therefore requires an INDEPENDENT signal before accepting a >2x
    stage: the runs' sampled `load` (max 1-min loadavg, published by
    Bench since round 11) must not materially exceed the loads of
    previously accepted runs (history entries now carry {stage, load}).
    When no load baseline exists yet, or loads are elevated, the only
    path is the explicit operator flag --accept-grown-stage — a human
    asserting "I added staged work this round", never unattended.
 3. On pass: write per-query confirmed minima (min `_stage`, total =
    sum + stage) and append the accepted {stage, load} to the history.

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
# a grown-stage acceptance needs loads comparable to accepted history;
# 1.5x tolerates normal drift while refusing the 8->20+ contention jumps
# this box exhibits (loads 8.7-11.2 recorded across round-11 accepts)
LOAD_FACTOR = 1.5


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def read_history() -> list:
    """History entries are {stage, load} dicts since round 12; earlier
    rounds appended bare floats (no load) — normalize on read."""
    if not os.path.exists(HISTORY):
        return []
    with open(HISTORY) as f:
        raw = json.load(f)
    return [e if isinstance(e, dict) else {"stage": e, "load": None}
            for e in raw]


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
    accept_grown = "--accept-grown-stage" in args
    if accept_grown:
        args.remove("--accept-grown-stage")
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
    # the mode of the run CONTRIBUTING the min _stage (round 14): with
    # the artifact store on, a gate's run 1 is cold-build (~4x the warm
    # load) and runs 2+ are warm-load — recording which one the merged
    # artifact carries keeps cross-round _stage comparisons honest
    stage_mode = min(runs, key=lambda r: r["queries"].get("_stage", 0.0)) \
        .get("stage_mode")
    run_loads = [r.get("load") for r in runs]
    history = read_history()
    if history:
        med = statistics.median(e["stage"] for e in history)
        if stage > STAGE_FACTOR * med:
            # Grown-stage escape hatch. Stage stability across >= 3 runs
            # is NECESSARY (grown staged work is run-stable; spiky
            # contention is not) but NOT SUFFICIENT: steady co-tenant
            # load inside one 20-40 min contention cycle is also
            # run-stable. So acceptance additionally needs an
            # INDEPENDENT contention signal: the runs' sampled loadavg
            # must sit at the accepted-history baseline. Without a load
            # baseline (or with elevated loads) only the explicit
            # --accept-grown-stage operator flag accepts — never
            # unattended.
            stages = sorted(r["queries"].get("_stage", 0.0) for r in runs)
            stable = (len(runs) >= 3 and stages[0] > 0 and
                      (stages[-1] - stages[0]) / stages[0] <= VARIANCE_TOL)
            hist_loads = [e["load"] for e in history if e.get("load")]
            base_load = statistics.median(hist_loads) if len(hist_loads) >= 3 \
                else None
            min_load = min((l for l in run_loads if l is not None),
                           default=None)
            load_ok = (base_load is not None and min_load is not None and
                       min_load <= LOAD_FACTOR * base_load)
            if stable and load_ok:
                print(f"NOTE: _stage {stage:.1f}s exceeds {STAGE_FACTOR}x "
                      f"trailing median {med:.1f}s but is STABLE across "
                      f"{len(runs)} runs ({stages}) at baseline load "
                      f"(min {min_load:.1f} <= {LOAD_FACTOR}x median "
                      f"{base_load:.1f}) — accepting as grown staged work")
            elif stable and accept_grown:
                print(f"NOTE: _stage {stage:.1f}s exceeds {STAGE_FACTOR}x "
                      f"trailing median {med:.1f}s; stage-stable across "
                      f"{len(runs)} runs ({stages}) and ACCEPTED BY "
                      "OPERATOR FLAG --accept-grown-stage (loads "
                      f"{run_loads} vs baseline "
                      f"{base_load if base_load else 'none'})")
            else:
                why = ("not stage-stable: need >= 3 runs within "
                       f"{VARIANCE_TOL*100:.0f}% (got {stages})" if not stable
                       else "no accepted-load baseline yet — rerun with "
                            "--accept-grown-stage if staged work grew this "
                            "round" if base_load is None
                       else f"loads {run_loads} exceed {LOAD_FACTOR}x "
                            f"baseline {base_load:.1f} — contention, or pass "
                            "--accept-grown-stage after verifying by hand")
                print(f"REFUSED: _stage {stage:.1f}s > {STAGE_FACTOR}x trailing "
                      f"median {med:.1f}s of {len(history)} accepted runs — "
                      f"{why}")
                return 1

    total = sum(v for v in merged.values() if v >= 0) + stage
    min_run_load = min((l for l in run_loads if l is not None), default=None)
    rec = {
        "metric": "total",
        "value": round(total, 2),
        "unit": "sec",
        "queries": {"_stage": round(stage, 2),
                    **{k: round(v, 2) for k, v in merged.items()}},
        "sf": runs[0].get("sf"),
    }
    # carry the quietest contributing run's sampled load so the merged
    # artifact is self-describing in bench_compare (r13: the committed
    # BENCH_local previously dropped it and compares printed None)
    if min_run_load is not None:
        rec["load"] = round(min_run_load, 1)
    if stage_mode is not None:
        rec["stage_mode"] = stage_mode
    with open(out, "w") as f:
        json.dump(rec, f, separators=(",", ":"))
        f.write("\n")
    # the accepted-stage history backs the degraded-box gate for the
    # CANONICAL artifact only — experimental --out refreshes must not
    # shift the trailing median the gate compares against
    canonical = os.path.join(os.path.dirname(HISTORY), "..", "BENCH_local.json")
    if os.path.realpath(out) == os.path.realpath(canonical):
        min_load = min((l for l in run_loads if l is not None), default=None)
        entry = {"stage": round(stage, 2),
                 "load": round(min_load, 1) if min_load is not None else None,
                 "mode": stage_mode}
        with open(HISTORY, "w") as f:
            json.dump((history + [entry])[-10:], f)
    n_err = sum(1 for v in merged.values() if v < 0)
    print(f"ACCEPTED: {out} <- confirmed minima over {len(runs)} runs, "
          f"total={rec['value']}s (_stage {stage:.1f}s, {len(merged)} "
          f"queries, {n_err} errored)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
