#!/usr/bin/env python3
"""Min-merge a raw bench reading into the committed per-query floor.

`graft.Bench` writes its RAW reading to `bench_reading.json`; the
committed floor `bench_result.json` is only ever updated by this tool.
The merge is a per-query MIN, which is monotone: folding any reading —
including a degraded invalid-epoch one — can only lower floors, never
raise them. That property is what makes the floor tamper-proof against
the rounds-14/15/16 footgun where an end-of-round snapshot commit
captured a raw degraded reading written over the floor file.

Rules:
  - for each query present in BOTH files: floor = min(floor, reading)
    (a reading of -1 = crashed query is ignored — a crash must never
    look like a 0-second floor)
  - queries only in the reading are ADDED at their reading value (new
    queries enter the floor on first fold)
  - queries only in the floor are KEPT unchanged (a partial reading
    must not drop coverage)
  - `value` is recomputed as the sum of the merged per-query floors;
    reading-specific epoch diagnostics (sentinel_secs, drift, segments)
    are nulled — they describe one epoch, not a min-merge
  - if nothing changed, the floor file is NOT rewritten (byte-identical)

Usage:
  python3 tools/fold_floor.py [reading.json] [floor.json] [--note TEXT]
  python3 tools/fold_floor.py --selftest

Defaults: reading=bench_reading.json floor=bench_result.json.
Exit 0 on success (including no-op), 1 on malformed input, 0 on a green
selftest / 1 on a red one.
"""
import json
import os
import sys
import tempfile


def load(path):
    with open(path) as f:
        return json.load(f)


def fold(floor, reading, note=None):
    """Return (merged_floor_dict, changed: bool)."""
    fq = dict(floor.get("queries", {}))
    rq = reading.get("queries", {})
    changed = False
    for name, v in rq.items():
        if not isinstance(v, (int, float)) or v < 0:
            continue  # crashed (-1) or junk readings never enter the floor
        old = fq.get(name)
        if old is None or (isinstance(old, (int, float)) and old >= 0 and v < old):
            fq[name] = v
            changed = True
        elif not isinstance(old, (int, float)) or old < 0:
            fq[name] = v
            changed = True
    if not changed:
        return floor, False
    merged = dict(floor)
    merged["queries"] = fq
    merged["value"] = round(sum(v for v in fq.values() if v >= 0), 3)
    merged["failed"] = []
    # epoch-specific diagnostics don't survive a min-merge
    for k in ("sentinel_secs", "sentinel_drift", "floor_outliers",
              "floor_ratio_segments", "artifacts_published", "warm_secs"):
        merged[k] = None
    if note:
        merged["note"] = note
    elif "note" not in merged:
        merged["note"] = "min-merged floor (tools/fold_floor.py)"
    return merged, True


def write_atomic(path, obj):
    d = os.path.dirname(os.path.abspath(path))
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, separators=(",", ":"))
            f.write("\n")
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def selftest():
    floor = {"metric": "total", "value": 3.0, "unit": "sec", "n": 3,
             "failed": [], "sf": "x",
             "queries": {"q1": 1.0, "q2": 2.0}}
    # 1. degraded reading (everything slower) -> floor byte-identical
    degraded = {"queries": {"q1": 1.7, "q2": 3.1}}
    merged, changed = fold(floor, degraded)
    assert not changed, "degraded fold must be a no-op"
    assert merged is floor
    # 2. faster q1 -> only q1 drops, value recomputed
    better = {"queries": {"q1": 0.4, "q2": 2.5}}
    merged, changed = fold(floor, better)
    assert changed
    assert merged["queries"] == {"q1": 0.4, "q2": 2.0}
    assert abs(merged["value"] - 2.4) < 1e-9
    assert merged["sentinel_drift"] is None
    # original floor dict untouched
    assert floor["queries"]["q1"] == 1.0
    # 3. new query enters; crashed (-1) reading ignored
    mixed = {"queries": {"q3": 0.9, "q1": -1}}
    merged, changed = fold(floor, mixed)
    assert changed
    assert merged["queries"] == {"q1": 1.0, "q2": 2.0, "q3": 0.9}
    # 4. crashed-only reading -> no-op
    crash = {"queries": {"q1": -1, "q2": -1}}
    _, changed = fold(floor, crash)
    assert not changed
    # 5. a -1 already in the FLOOR is replaced by any valid reading
    holed = dict(floor, queries={"q1": -1.0, "q2": 2.0})
    merged, changed = fold(holed, {"queries": {"q1": 5.0}})
    assert changed and merged["queries"]["q1"] == 5.0
    # 6. file-level: degraded fold leaves the file byte-identical
    with tempfile.TemporaryDirectory() as d:
        fp = os.path.join(d, "floor.json")
        rp = os.path.join(d, "reading.json")
        with open(fp, "w") as f:
            json.dump(floor, f)
        before = open(fp, "rb").read()
        with open(rp, "w") as f:
            json.dump(degraded, f)
        rc = main([rp, fp])
        assert rc == 0
        assert open(fp, "rb").read() == before, \
            "degraded fold must leave the floor file byte-identical"
    print("fold_floor selftest: OK")
    return 0


def main(argv):
    if "--selftest" in argv:
        return selftest()
    note = None
    if "--note" in argv:
        i = argv.index("--note")
        note = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    reading_path = argv[0] if len(argv) > 0 else "bench_reading.json"
    floor_path = argv[1] if len(argv) > 1 else "bench_result.json"
    try:
        reading = load(reading_path)
    except (OSError, ValueError) as e:
        print(f"fold_floor: cannot read reading {reading_path}: {e}",
              file=sys.stderr)
        return 1
    if not os.path.exists(floor_path):
        # first fold ever: the reading IS the floor
        write_atomic(floor_path, reading)
        print(f"fold_floor: seeded {floor_path} from {reading_path}")
        return 0
    try:
        floor = load(floor_path)
    except (OSError, ValueError) as e:
        print(f"fold_floor: cannot read floor {floor_path}: {e}",
              file=sys.stderr)
        return 1
    merged, changed = fold(floor, reading, note)
    if not changed:
        print(f"fold_floor: no per-query improvement in {reading_path}; "
              f"{floor_path} unchanged")
        return 0
    improved = sum(
        1 for k, v in reading.get("queries", {}).items()
        if isinstance(v, (int, float)) and v >= 0
        and merged["queries"].get(k) == v
        and floor.get("queries", {}).get(k) != v)
    write_atomic(floor_path, merged)
    print(f"fold_floor: folded {improved} per-query improvements; "
          f"floor total {floor.get('value')} -> {merged['value']}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
