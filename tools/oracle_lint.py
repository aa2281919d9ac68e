#!/usr/bin/env python3
"""Oracle COLUMN-TYPE lint (dev tooling only, not part of the library).

The driver's correctness gate hashes values after sorting columns by name,
and the hash covers the DuckDB-side *type* of each cell. Three rounds have
now lost a query to the same class of blemish: DuckDB widens SUM(BIGINT)
(and integer arithmetic over it) to HUGEINT, while the Spark dump is
BIGINT — every value matches, the hash doesn't (q60 r4, q123, q122 r10).

This lint makes that class impossible to re-introduce silently: it DESCRIBEs
every committed oracle SQL under local DuckDB and diffs the resulting column
types against the schema of the Spark parquet dump graft.Verify wrote. Any
mismatch — HUGEINT vs BIGINT, DECIMAL widening, VARCHAR vs BLOB — is a
latent hash failure and fails the lint, even when the values agree.

Usage: python3 tools/oracle_lint.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# The driver hashes *values* after materializing through pandas, so the
# observable type boundary is the numpy dtype KIND, not the DuckDB logical
# type or the dtype width: q10's rank() is Spark INTEGER vs DuckDB BIGINT
# (int32 vs int64, both kind 'i') and has hash-matched for ten rounds,
# while q122's HUGEINT landed as kind 'f'/'O' against Spark's 'i' and
# mismatched despite equal values. Lint at exactly that altitude: flag
# when the dtype kinds differ — and surface the DuckDB type in the
# message so the fix (CAST ... AS BIGINT) is obvious.


def types_of(con, sql):
    rel = con.sql(sql)
    ducks = dict(zip(rel.columns, [str(t) for t in rel.types]))
    kinds = {c: d.kind for c, d in rel.df().dtypes.items()}
    return {c: (ducks[c], kinds[c]) for c in ducks}


def compatible(a, b):
    return a[1] == b[1]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = types_of(con, sql)
            got = types_of(
                con, f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
        except Exception as e:
            print(f"LINT-ERR {name}: {e}")
            n_bad += 1
            continue
        if sorted(exp) != sorted(got):
            print(f"LINT-FAIL {name}: column sets differ "
                  f"{sorted(exp)} vs {sorted(got)}")
            n_bad += 1
            continue
        bad = [(c, got[c], exp[c]) for c in sorted(exp)
               if not compatible(got[c], exp[c])]
        if bad:
            for c, g, e in bad:
                print(f"LINT-FAIL {name}: col {c}: "
                      f"spark={g[0]}/{g[1]} oracle={e[0]}/{e[1]}"
                      + ("  <-- cast the oracle expr to BIGINT"
                         if e[0] == "HUGEINT" else ""))
            n_bad += 1
        else:
            n_ok += 1
    print(f"== oracle_lint: {n_ok} clean, {n_bad} violations ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
