#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate: run each
oracle SQL against the sfDir tables, compare to the Verify parquet
dumps (sorted rows, sorted columns, value-level compare)."""
import sys, json, glob, math
import duckdb
import pandas as pd

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/v1"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fail += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    key = list(exp.columns)
    exp = exp.sort_values(key, na_position="last").reset_index(drop=True)
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    mismatch = None
    for c in key:
        for i in range(len(exp)):
            a, b = exp[c].iloc[i], got[c].iloc[i]
            an = a is None or (isinstance(a, float) and math.isnan(a)) or pd.isna(a)
            bn = b is None or (isinstance(b, float) and math.isnan(b)) or pd.isna(b)
            if an and bn:
                continue
            if an != bn or (isinstance(a, float) and a != b) or \
               (not isinstance(a, float) and str(a) != str(b)):
                mismatch = (c, i, a, b)
                break
        if mismatch:
            break
    if mismatch:
        c, i, a, b = mismatch
        print(f"FAIL {name}: first mismatch col={c} row={i} exp={a!r} got={b!r}")
        fail += 1
    else:
        print(f"OK   {name}: {len(exp)} rows")
        ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
