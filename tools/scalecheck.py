#!/usr/bin/env python3
"""Per-query DuckDB oracle compare for the synthetic scale corpora (dev
tooling; the SCALE.md "oracle-checked 100x point" harness).

Same canon/compare as tools/check.py, but each query runs in its OWN
subprocess with a DuckDB memory_limit, a spill directory, and a wall
timeout — at 500k docs a pair-pipeline oracle can otherwise take the
whole host down (measured: >100 GB RSS / >79 GB spill before the caps).
Queries the oracle engine cannot finish are reported as TIMEOUT/OOM,
NOT as failures: at this scale that is an oracle-engine limit, and the
distinction is the point of the exercise.

Usage:
  python3 tools/scalecheck.py <sfDir> <verifyOutDir> [timeoutSecs=240]
      [memLimit=24GB]
  # <verifyOutDir> comes from graft.Verify run with its dev-only query
  # filter against <sfDir>; oracle_sql.json there must hold the FULL
  # oracle map (re-copy it from a full-suite Verify dump if a filtered
  # resume run overwrote it).
Exit codes: 0 = no mismatches (TIMEOUT/OOM allowed), 1 = any FAIL.
"""
import json
import os
import subprocess
import sys
from collections import Counter


def run_one(sf_dir, out_dir, name, mem_limit):
    """Subprocess entry: compare one query, exit 0/1."""
    import duckdb
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check import canon, cells_equal
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{mem_limit}'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.isfile(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    got_rel = con.sql(
        f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
    got_cols = got_rel.columns
    got = got_rel.fetchall()
    exp_rel = con.sql(sql)
    exp_cols = exp_rel.columns
    exp = exp_rel.fetchall()
    if sorted(got_cols) != sorted(exp_cols):
        print(f"FAIL {name}: columns {sorted(got_cols)} != "
              f"{sorted(exp_cols)}")
        return 1
    g, _ = canon(got, got_cols)
    e, _ = canon(exp, exp_cols)
    if len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}")
        return 1
    for i, (rg, re_) in enumerate(zip(g, e)):
        if len(rg) != len(re_) or not all(
                cells_equal(a, b) for a, b in zip(rg, re_)):
            print(f"FAIL {name}: row {i}: {rg} != {re_}")
            return 1
    print(f"PASS {name} ({len(g)} rows)")
    return 0


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        sys.exit(run_one(sys.argv[2], sys.argv[3], sys.argv[4],
                         sys.argv[5]))
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 240
    mem = sys.argv[4] if len(sys.argv) > 4 else "24GB"
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    res = {}
    for n in names:
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 sf_dir, out_dir, n, mem],
                capture_output=True, text=True, timeout=timeout)
            o = p.stdout + p.stderr
            tag = "PASS" if p.returncode == 0 else "FAIL"
            if p.returncode != 0:
                # Genuine memory-limit hits are a non-failing oracle-engine
                # limit (that distinction is this harness's point). A full
                # DISK is an environment failure — no query was actually
                # oracle-checked — and must not green the run as OOM.
                if "No space left" in o:
                    tag = "ENV"
                elif "Out of Memory" in o or "memory limit" in o:
                    tag = "OOM"
            res[n] = (tag, o.strip().splitlines()[-1][:200] if o.strip()
                      else "")
        except subprocess.TimeoutExpired:
            res[n] = ("TIMEOUT", f"oracle exceeded {timeout}s")
        print(n, res[n][0], flush=True)
    print(Counter(t for t, _ in res.values()))
    for n, (t, m) in res.items():
        if t != "PASS":
            print("DETAIL", n, t, m)
    tags = [t for t, _ in res.values()]
    # fail on any value mismatch or environment failure; also fail when
    # EVERY query landed in a non-PASS bucket (nothing was checked at all)
    bad = any(t in ("FAIL", "ENV") for t in tags) or (
        bool(tags) and not any(t == "PASS" for t in tags))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
