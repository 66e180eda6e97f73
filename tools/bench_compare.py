#!/usr/bin/env python3
"""Compare two bench records on their shared query subset.

Usage: python3 tools/bench_compare.py <old.json> <new.json> [--out report.json]

Accepts either a raw Bench stdout record (one `{"metric": ...}` line)
or a driver wrapper object whose `tail` field embeds that line. Prints
the shared-subset totals and the per-query deltas beyond 25%, excluding
`_stage`/`_rest` bookkeeping entries. The subset total is the
round-over-round comparability statistic SURVEY quotes (new queries are
additive surface and excluded by construction).

With --out, also writes a JSON report naming every shared query whose
old/new ratio exceeds 2x in either direction — the contended-driver-box
self-identification artifact (VERDICT r8 ask #6): a driver record whose
entries run >2x the gated BENCH_local.json values is a degraded box, not
a regression.
"""
import json
import re
import sys


# records end "sf":N} through round 10, "sf":N,"load":N} since Bench
# started publishing the sampled loadavg in round 11, and optionally
# carry a ,"stage_mode":"..." marker since round 14
RECORD_RE = (r'\{"metric".*?"sf":(?:[0-9.]+|"[^"]*")(?:,"load":[0-9.]+)?'
             r'(?:,"stage_mode":"[a-z-]+")?\}')


def load(path: str) -> dict:
    with open(path) as f:
        raw = f.read()
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        # captured Bench stdout with log lines around the record —
        # scan for the last record-shaped line instead of crashing
        m = re.findall(RECORD_RE, raw)
        if not m:
            raise SystemExit(f"{path}: no bench record found")
        return json.loads(m[-1])
    if "queries" in obj:
        return obj
    # driver wrapper: the bench stdout line is embedded in `tail`
    # sf is numeric in current records, a quoted path in round-1-era ones
    m = re.findall(RECORD_RE, obj.get("tail", ""))
    if not m:
        raise SystemExit(f"{path}: no bench record found in driver wrapper")
    return json.loads(m[-1])


def main(argv: list) -> int:
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    old_path, new_path = argv
    old, new = load(old_path), load(new_path)
    qo, qn = old["queries"], new["queries"]
    skip = {"_stage", "_rest", "_rest_n"}
    shared = sorted((set(qo) & set(qn)) - skip)
    to = sum(qo[q] for q in shared)
    tn = sum(qn[q] for q in shared)
    print(f"shared subset: {len(shared)} queries")
    print(f"old total {to:.1f}s -> new total {tn:.1f}s  ({tn / to:.2f}x)")
    print(f"old _stage {qo.get('_stage')}  new _stage {qn.get('_stage')}")
    # box-contention fingerprint (VERDICT r12 ask #6): Bench publishes
    # the max 1-min loadavg sampled across the run since round 11 —
    # carrying both sides here makes a contended box self-evident in
    # the compare artifact itself (r12's load 12.4 vs gated 6.9 was
    # the whole regression story)
    print(f"old load {old.get('load')}  new load {new.get('load')}")
    # stage mode (round 14): cold-build vs warm-load vs session — a
    # _stage delta between records of DIFFERENT modes is cache warmth,
    # not a staging regression (and vice versa: a warm cache can mask
    # one). Records before round 14 carry no marker (None).
    print(f"old stage_mode {old.get('stage_mode')}  "
          f"new stage_mode {new.get('stage_mode')}")
    only_new = sorted((set(qn) - set(qo)) - skip)
    if only_new:
        added = sum(qn[q] for q in only_new)
        print(f"new-only queries: {len(only_new)} totalling {added:.1f}s")
    print("per-query deltas >25% (shared, both >=0.5s):")
    flagged = []
    for q in shared:
        a, b = qo[q], qn[q]
        if min(a, b) >= 0.5 and abs(b - a) / a > 0.25:
            print(f"  {q}: {a:.2f} -> {b:.2f}  ({b / a:.2f}x)")
        if min(a, b) >= 0.5 and max(a / b, b / a) > 2.0:
            # ratio is the symmetric magnitude; direction says which
            # side is slow — a new-side regression must not sort below
            # (or read as) a contended-old-box row
            flagged.append({"query": q, "old": a, "new": b,
                            "ratio": round(max(a / b, b / a), 2),
                            "slower": "old" if a > b else "new"})
    if out_path:
        # driver records fold `_stage` into the total without a line
        # item; the implied value (total minus every query entry) is the
        # degraded-box fingerprint bench_refresh.py gates on
        def stage(rec):
            q = rec["queries"]
            if "_stage" in q:
                return q["_stage"]
            return round(rec["value"] - sum(v for k, v in q.items()
                                            if k not in skip) - q.get("_rest", 0), 1)
        report = {
            "old": old_path, "new": new_path,
            "shared_queries": len(shared),
            "old_total_sec": round(to, 1), "new_total_sec": round(tn, 1),
            "old_stage_sec": stage(old),
            "new_stage_sec": stage(new),
            # max 1-min loadavg each run sampled (null for pre-round-11
            # records) — read a lopsided flagged list against these
            "old_load": old.get("load"),
            "new_load": new.get("load"),
            # cold-build / warm-load / session (None pre-round-14) —
            # compare _stage only across LIKE modes
            "old_stage_mode": old.get("stage_mode"),
            "new_stage_mode": new.get("stage_mode"),
            "flagged_over_2x": sorted(flagged, key=lambda r: -r["ratio"]),
            "note": "flagged = shared queries (both >=0.5s) whose "
                    "ratio (symmetric, see 'slower') exceeds 2x; a "
                    "cluster of slower=old rows with old_stage >> "
                    "new_stage means the OLD record came from a "
                    "contended box",
        }
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {out_path}: {len(flagged)} queries flagged >2x")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
