#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares a fresh `graft.Bench` result against the committed baseline
(`bench_result.json`) and FAILS (exit 1) on any per-query regression that
clears BOTH bars:

  new >= RATIO * old                     (default 1.5x — the judge's gate)
  new - old >= clamp(old, MIN_ABS_LO, MIN_ABS)   (tiered absolute floor)

Why two bars: rounds 4 and 5 ran the IDENTICAL binary and still spread
+-25% per query at sub-second magnitudes (e.g. q43 +46% on a 0.12 s base,
q04 -12%) with a +-5% total swing, and two back-to-back identical-binary
runs in round 6 spread +-55% / +-0.48 s on sub-1.5 s queries (q19 0.80 <->
1.23 s, q58 0.61 <-> 1.09 s) with a 1.07x total swing — that is this
host's measured noise band. A pure ratio gate on a 0.1 s query flags pure
noise; the absolute floor keeps the gate quiet inside the band while still
catching a 2 s -> 3 s real regression.

Why the floor is TIERED (clamp(old, 0.1, 0.3), re-sized round 8): a flat
floor is blind to big-ratio regressions on fast queries; scaling it to
the baseline gates each query at its own magnitude. The clamp window was
[0.2, 0.6] while the JIT code-cache bug made same-binary swings of
+-0.48 s routine; with the fix in, three back-to-back full runs (round
8, BENCH_GATE.txt) spread at most 1.24x / +0.42 s on a 1.8 s query and
+-0.13 s on everything under 1.5 s — so the window shrinks to
[0.1, 0.3]: a 2x blowup on a 0.2 s query now flags, and the 0.3 s cap
still sits >2x above the worst observed sub-1.5 s swing (the 1.5x ratio
bar alone already screens the big-query noise, whose worst observed
ratio is 1.24x). The total is gated at TOTAL_RATIO (default 1.25x) —
totals average out per-query noise, so a tighter bound holds and several
sub-floor creeps can't hide simultaneously.

The TOTAL is gated by the round-12 re-anchor (VERDICT r12, Performance):
PER-QUERY AVERAGE <= PQ_GATE (default 0.40 s/query, min-of-3 at sf0.1),
scaling with suite growth — replacing the fixed 50 s anchor set over the
65-query round-3 suite. Before any verdict, the reading is checked for
epoch validity per the pre-registered criteria:

  - sentinel_drift >= DRIFT_MAX (default 1.3)   -> INVALID EPOCH (exit 2):
    the host degraded over the run; re-run, don't grade.
  - floor_outliers dominated (>= 60%, >= 3 entries) by ONE artifact-cache
    family (model / bpe / pair / cc)            -> ARTIFACT-COLD (exit 2):
    cache fingerprints rotated and one-time republish landed in the run;
    re-run against the now-warm store.
  - artifacts_published > 0 in the reading is reported (the run warmed a
    cold store); with the Warm phase ahead of all timed passes this alone
    is NOT invalidating — republish cost sits outside the timed windows.

Usage:
  python3 tools/bench_gate.py <baseline.json> <current.json> \
      [--ratio 1.5] [--min-abs 0.3] [--pq-gate 0.40] [--drift-max 1.3]

Both files are `graft.Bench` output lines:
  {"metric":"total","value":N,"unit":"sec","queries":{"qNN_name":sec,...}}

Added / removed queries are reported but never fail the gate (coverage is
the correctness gate's job); a query that FAILED in the current run
(value -1) always fails the gate.

Exit codes: 0 = pass, 1 = genuine regression, 2 = invalid epoch (re-run).
"""
import argparse
import json
import sys

# Artifact-cache families (short qNN keys; long names are normalized).
# A floor-outlier list dominated by exactly one of these is the signature
# of a fingerprint rotation re-training that family's artifacts, not of a
# code regression (the BENCH_r12 adjudication).
CACHE_FAMILIES = {
    "model": {"q24", "q40", "q48", "q64", "q68", "q73", "q81", "q93",
              "q101", "q117"},
    "bpe": {"q95", "q103", "q108", "q122", "q123", "q144", "q162",
            "q164"},
    "pair": {"q19", "q59", "q83", "q94", "q96", "q98", "q99", "q100",
             "q102", "q136"},
    "cc": {"q59", "q78", "q94", "q96", "q98", "q140"},
}


def short(name):
    return name.split("_")[0]


def classify_outliers(outliers):
    """Return (family, hits) if one cache family dominates the outlier
    list (>= 60% of it, >= 3 queries), else (None, [])."""
    keys = [short(q) for q in outliers]
    best, best_hits = None, []
    for fam, members in CACHE_FAMILIES.items():
        hits = [k for k in keys if k in members]
        if len(hits) > len(best_hits):
            best, best_hits = fam, hits
    if best and len(best_hits) >= 3 and len(best_hits) >= 0.6 * len(keys):
        return best, best_hits
    return None, []


def load(path):
    with open(path) as f:
        text = f.read().strip()
    # tolerate a wrapping driver record {"parsed": {...}}
    d = json.loads(text.splitlines()[-1])
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        sys.exit(f"bench_gate: no 'queries' key in {path}")
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("baseline")
    ap.add_argument("current")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--min-abs", type=float, default=0.3,
                    help="upper clamp of the tiered absolute floor")
    ap.add_argument("--min-abs-lo", type=float, default=0.1,
                    help="lower clamp of the tiered absolute floor")
    ap.add_argument("--pq-gate", type=float, default=0.40,
                    help="round-13 re-anchored gate: max per-query average "
                         "seconds (scales with suite size)")
    ap.add_argument("--drift-max", type=float, default=1.3,
                    help="sentinel_drift at/above this = invalid epoch")
    args = ap.parse_args()

    base, cur = load(args.baseline), load(args.current)
    bq, cq = base["queries"], cur["queries"]
    fails, notes = [], []

    # ---- epoch validity: pre-registered discard criteria ------------------
    # min-merged floor files carry null for the per-run fields — treat
    # null like absent instead of crashing on float(None)/int(None)
    _drift = cur.get("sentinel_drift")
    drift = float(_drift) if _drift is not None else -1.0
    outliers = cur.get("floor_outliers") or []
    _pub = cur.get("artifacts_published")
    published = int(_pub) if _pub is not None else -1
    if published > 0:
        notes.append(f"  cold:    run published {published} artifact(s) in "
                     f"its Warm phase ({cur.get('warm_secs', '?')}s, "
                     "outside the timed passes)")
    if drift >= args.drift_max:
        print(f"== INVALID EPOCH: sentinel_drift {drift:.3f} >= "
              f"{args.drift_max} (host degraded over the run) — re-run, "
              "do not grade ==")
        sys.exit(2)
    # positional drift (round-14): per-segment floor-ratio medians from
    # the reading itself. The q01 sentinel undersees a host degrading
    # over the run (r11: quartile medians 1.18x -> 1.76x while drift read
    # within bounds); the segment medians see it directly. A uniformly
    # slow host is FLAT across segments and stays valid — only a rising/
    # falling profile (max/min >= the drift bar) invalidates.
    segs = [float(x) for x in (cur.get("floor_ratio_segments") or [])
            if x is not None and float(x) > 0]
    if len(segs) >= 2 and max(segs) / min(segs) >= args.drift_max:
        print(f"== INVALID EPOCH (POSITIONAL DRIFT): per-segment "
              f"floor-ratio medians {['%.2f' % s for s in segs]} spread "
              f"{max(segs) / min(segs):.2f}x >= {args.drift_max} — the "
              "host changed speed DURING the run; re-run, do not grade ==")
        sys.exit(2)
    fam, hits = classify_outliers(outliers)
    if fam:
        print(f"== INVALID EPOCH (ARTIFACT-COLD): floor-outlier list "
              f"dominated by the '{fam}' cache family "
              f"({len(hits)}/{len(outliers)}: {' '.join(hits)}) — "
              "fingerprint rotation re-trained that family inside the run; "
              "re-run against the warm store ==")
        sys.exit(2)

    for name in sorted(set(bq) | set(cq)):
        if name not in cq:
            notes.append(f"  removed: {name} (was {bq[name]:.3f}s)")
            continue
        if name not in bq:
            notes.append(f"  added:   {name} ({cq[name]:.3f}s)")
            continue
        old, new = float(bq[name]), float(cq[name])
        if new < 0:
            fails.append(f"  FAIL {name}: query errored in current run")
            continue
        if old <= 0:
            notes.append(f"  fixed:   {name} (errored in baseline)")
            continue
        ratio = new / old
        floor = max(args.min_abs_lo, min(args.min_abs, old))
        if ratio >= args.ratio and (new - old) >= floor:
            fails.append(
                f"  FAIL {name}: {old:.3f}s -> {new:.3f}s "
                f"({ratio:.2f}x, +{new - old:.3f}s >= {floor:.2f}s floor)")
        elif ratio >= args.ratio:
            notes.append(
                f"  noise:   {name} {old:.3f}s -> {new:.3f}s "
                f"({ratio:.2f}x but +{new - old:.3f}s < {floor:.2f}s floor)")

    # ---- total: the re-anchored per-query-average gate --------------------
    told, tnew = float(base.get("value", 0)), float(cur.get("value", 0))
    n_ok = len([q for q in cq if float(cq[q]) >= 0])
    per_query = tnew / n_ok if n_ok else float("nan")
    total_gate = args.pq_gate * n_ok
    if n_ok and per_query > args.pq_gate:
        fails.append(
            f"  FAIL total: {tnew:.3f}s / {n_ok} queries = "
            f"{per_query:.3f} s/query > {args.pq_gate} s/query gate "
            f"(= {total_gate:.1f}s at this suite size)")

    shared = [q for q in bq if q in cq and float(cq[q]) >= 0 and float(bq[q]) > 0]
    print(f"bench_gate: {len(shared)} shared queries, "
          f"total {told:.3f}s -> {tnew:.3f}s "
          f"({(tnew / told if told > 0 else float('nan')):.2f}x); "
          f"{per_query:.3f} s/query vs {args.pq_gate} gate "
          f"(= {total_gate:.1f}s at {n_ok} queries); "
          f"sentinel_drift {drift:.3f} < {args.drift_max}")
    for n in notes:
        print(n)
    if fails:
        print(f"== GATE FAILED: {len(fails)} finding(s) "
              f"(per-query regressions >= {args.ratio}x over the tiered "
              f"[{args.min_abs_lo}, {args.min_abs}]s floor, or total over "
              f"{args.pq_gate} s/query) ==")
        for f_ in fails:
            print(f_)
        sys.exit(1)
    print(f"== GATE PASS: no per-query regression >= {args.ratio}x "
          f"over the tiered [{args.min_abs_lo}, {args.min_abs}]s floor, "
          f"total {per_query:.3f} <= {args.pq_gate} s/query ==")


if __name__ == "__main__":
    main()
