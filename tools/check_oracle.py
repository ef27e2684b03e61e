#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query, read the Spark result parquet and run the oracle SQL
in DuckDB against the same sf tables; compare schema, row count, and
values (columns sorted by name). Exit 1 on any mismatch.
"""
import json, sys, glob, os
import duckdb

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    seen = set()
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        seen.add(name)
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        want = con.sql(oracles[name]).df()
        ok, msg = compare(got, want)
        status = "OK " if ok else "FAIL"
        print(f"[{status}] {name}: {msg}")
        failures += 0 if ok else 1
    # a declared oracle with NO result dir means the Spark query
    # CRASHED in Verify — the driver counts that as a failure, so the
    # local stand-in must too (a silent skip once hid exactly this)
    for name in sorted(set(oracles) - seen):
        print(f"[FAIL] {name}: declared oracle but no Spark result "
              "written — the query crashed in Verify")
        failures += 1
    return 1 if failures else 0

def compare(got, want):
    import pandas as pd
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        return False, f"columns differ: {list(g.columns)} vs {list(w.columns)}"
    if len(g) != len(w):
        return False, f"row count {len(g)} vs {len(w)}"
    if [str(t) for t in g.dtypes] != [str(t) for t in w.dtypes]:
        return False, f"dtypes differ: {list(zip(g.columns, g.dtypes, w.dtypes))}"
    g2 = g.reset_index(drop=True)
    w2 = w.reset_index(drop=True)
    neq = (g2.astype(str) != w2.astype(str))
    if neq.any().any():
        bad_cols = [c for c in g2.columns if neq[c].any()]
        i = neq.any(axis=1).idxmax()
        return False, (f"values differ in {bad_cols}; first bad row {i}: "
                       f"got {g2.iloc[i].to_dict()} want {w2.iloc[i].to_dict()}")
    return True, f"{len(g)} rows match"

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(main(sf, out))
