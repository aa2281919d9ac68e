#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only, not
part of the library). Runs DuckDB oracle SQL against the same parquet test
tables and compares with the parquet dumps graft.Verify wrote.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t)), [cols[i] for i in order]


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if isinstance(a, float) and isinstance(b, float):
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b
        return float(a) == float(b)
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        # partial dirs (e.g. the synthetic scale corpora, which carry
        # only documents/embeddings) just skip the absent tables — a
        # query referencing one then fails loudly at SQL time
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a DIRECTORY of part files (the driver's
            # testdata is a single pandas-written file) — glob the parts
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.isfile(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # A query that CRASHED inside Verify leaves no dump dir either —
    # Verify swallows the Throwable and records it only in errors.json.
    # Without this read, a crash is indistinguishable from "not requested
    # by the dev-only query filter" and silently greens the gate.
    crashed = {}
    err_path = f"{out_dir}/errors.json"
    if os.path.isfile(err_path):
        try:
            crashed = json.load(open(err_path)).get("failures", {}) or {}
        except (OSError, ValueError) as e:
            print(f"WARN cannot parse {err_path}: {e}")
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in crashed:
            print(f"FAIL {name}: crashed in Verify: {crashed[name][:200]}")
            n_fail += 1
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            # Verify was run with its dev-only query filter: entries
            # without a dump were not requested — not a failure
            n_skip += 1
            continue
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = got_rel.columns
            got = got_rel.fetchall()
            exp_rel = con.sql(sql)
            exp_cols = exp_rel.columns
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        g, cols = canon(got, got_cols)
        e, _ = canon(exp, exp_cols)
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount {len(g)} != {len(e)}")
            n_fail += 1
            continue
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            for j, (gc, ec) in enumerate(zip(gr, er)):
                if not cells_equal(gc, ec):
                    bad = (i, cols[j], gc, ec)
                    break
            if bad:
                break
        if bad:
            i, c, gc, ec = bad
            print(f"FAIL {name}: row {i} col {c}: spark={gc!r} oracle={ec!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    skipped = f", {n_skip} not-requested skipped" if n_skip else ""
    print(f"== {n_pass} pass, {n_fail} fail{skipped} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
