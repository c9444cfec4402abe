#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <name> subdir in verifyOutDir: read Spark's parquet result, run
the matching SQL from oracle_sql.json in DuckDB (tables = views over the
sfDir parquet files), sort columns by name + rows by all columns, and
compare values cell-by-cell (exact for ints/strings, tiny-epsilon report
for floats so rounding issues are visible).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    t = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
fails = 0
for name in names:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files \
        else pd.DataFrame()
    if name not in oracle:
        print(f"{name:24s} NO-ORACLE rows={len(got)}")
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name:24s} ORACLE-SQL-ERROR {e}")
        fails += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"{name:24s} SCHEMA-MISMATCH got={list(got.columns)} exp={list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"{name:24s} ROWCOUNT got={len(got)} exp={len(exp)}")
        fails += 1
        continue
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)
    es = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    bad = []
    for c in gs.columns:
        g, e = gs[c], es[c]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            gv = g.astype(float).to_numpy()
            ev = e.astype(float).to_numpy()
            if not np.array_equal(gv, ev, equal_nan=True):
                d = np.nanmax(np.abs(gv - ev))
                bad.append(f"{c}(float maxdiff={d:.3e})")
        else:
            gv, ev = g.astype(str).to_numpy(), e.astype(str).to_numpy()
            if not np.array_equal(gv, ev):
                i = int(np.nonzero(gv != ev)[0][0])
                bad.append(f"{c}(row{i}: {gv[i]!r} vs {ev[i]!r})")
    if bad:
        print(f"{name:24s} VALUE-MISMATCH {'; '.join(bad)}")
        fails += 1
    else:
        print(f"{name:24s} OK rows={len(got)}")
print(f"\n{len(names)-fails}/{len(names)} passed")
sys.exit(1 if fails else 0)
