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

Usage:
  python3 tools/bench_gate.py <baseline.json> <current.json> \
      [--ratio 1.5] [--min-abs 0.3] [--total-ratio 1.25]

Both files are `graft.Bench` output lines:
  {"metric":"total","value":N,"unit":"sec","queries":{"qNN_name":sec,...}}

Added / removed queries are reported but never fail the gate (coverage is
the correctness gate's job); a query that FAILED in the current run
(value -1) always fails the gate.
"""
import argparse
import json
import sys


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
    ap.add_argument("--total-ratio", type=float, default=1.25)
    args = ap.parse_args()

    base, cur = load(args.baseline), load(args.current)
    bq, cq = base["queries"], cur["queries"]
    fails, notes = [], []

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

    told, tnew = float(base.get("value", 0)), float(cur.get("value", 0))
    if told > 0 and tnew / told >= args.total_ratio:
        fails.append(
            f"  FAIL total: {told:.3f}s -> {tnew:.3f}s "
            f"({tnew / told:.2f}x >= {args.total_ratio}x)")

    shared = [q for q in bq if q in cq and float(cq[q]) >= 0 and float(bq[q]) > 0]
    print(f"bench_gate: {len(shared)} shared queries, "
          f"total {told:.3f}s -> {tnew:.3f}s "
          f"({(tnew / told if told > 0 else float('nan')):.2f}x)")
    for n in notes:
        print(n)
    if fails:
        print(f"== GATE FAILED: {len(fails)} regression(s) "
              f"(>= {args.ratio}x and over the tiered "
              f"[{args.min_abs_lo}, {args.min_abs}]s floor) ==")
        for f_ in fails:
            print(f_)
        sys.exit(1)
    print(f"== GATE PASS: no per-query regression >= {args.ratio}x "
          f"over the tiered [{args.min_abs_lo}, {args.min_abs}]s floor, "
          f"total < {args.total_ratio}x ==")


if __name__ == "__main__":
    main()
