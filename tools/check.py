#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracle SQL and compare (row count, schema-ish, values).
Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
if len(sys.argv) > 3:  # optional name filter for fast iteration
    only = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fails += 1; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    # stringify (like a hash would) and compare cell-wise
    gs, es = g.astype(str), e.astype(str)
    if gs.equals(es):
        print(f"OK   {name}: {len(got)} rows")
    else:
        diff = (gs != es)
        ncell = int(diff.values.sum())
        print(f"FAIL {name}: {ncell} mismatched cells of {diff.size}")
        mask = diff.any(axis=1)
        print(pd.concat([g[mask].head(3).add_prefix("got_"),
                         e[mask].head(3).add_prefix("exp_")], axis=1).to_string())
        fails += 1
print(f"\n{len(oracle)-fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
