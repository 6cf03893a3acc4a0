#!/usr/bin/env python3
"""Replicates the driver's correctness compare: for each query output
parquet under OUT_DIR, run the oracle SQL (oracle_sql.json) in DuckDB over
the same sf tables, sort columns by name, sort rows, compare values."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

out_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        continue
    try:
        ours = pd.concat([pq.read_table(p).to_pandas() for p in glob.glob(f"{qdir}/*.parquet")])
    except Exception as e:
        print(f"FAIL {name}: cannot read output: {e}"); fails += 1; continue
    if name not in oracle:
        print(f"rows-only {name}: {len(ours)} rows" + (" EMPTY!" if len(ours)==0 else ""))
        if len(ours) == 0: fails += 1
        continue
    try:
        theirs = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    a, b = canon(ours), canon(theirs)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); fails += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fails += 1; continue
    ok = True
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if av.dtype != bv.dtype:
            # dtype mismatch is a schema mismatch for the driver
            print(f"FAIL {name}: col {c} dtype {av.dtype} vs {bv.dtype}"); ok = False; continue
        if av.dtype == object:
            neq = av != bv
        elif np.issubdtype(av.dtype, np.floating):
            neq = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
        else:
            neq = av != bv
        if neq.any():
            i = int(np.argmax(neq))
            print(f"FAIL {name}: col {c} differs at row {i}: {av[i]!r} vs {bv[i]!r} ({int(neq.sum())} diffs)")
            ok = False
    if ok:
        print(f"OK   {name}: {len(a)} rows")
    else:
        fails += 1
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
