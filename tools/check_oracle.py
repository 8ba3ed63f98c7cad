#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracle parity (mimics the driver's
DuckDB compare): loads each Spark result parquet from outDir, runs the
matching oracle SQL in DuckDB over the same sf tables, canonicalizes
(sort columns by name, sort rows), and diffs values exactly."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    try:
        got = canon(pd.read_parquet(spark_path))
        want = canon(con.execute(sql).df())
    except Exception as e:
        fails.append((name, f"load/exec error: {e}"))
        continue
    if list(got.columns) != list(want.columns):
        fails.append((name, f"columns differ: spark={list(got.columns)} oracle={list(want.columns)}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"rowcount differ: spark={len(got)} oracle={len(want)}"))
        continue
    mismatch = None
    for c in got.columns:
        a, b = got[c], want[c]
        try:
            import numpy as np
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                af, bf = a.astype(float), b.astype(float)
                bad = ~((af == bf) | (af.isna() & bf.isna()))
            else:
                bad = ~((a == b) | (a.isna() & b.isna()))
            if bad.any():
                i = bad.idxmax()
                mismatch = f"col {c} row {i}: spark={a[i]!r} oracle={b[i]!r} (n_bad={bad.sum()})"
                break
        except Exception as e:
            mismatch = f"col {c} compare error: {e} (spark dtype {a.dtype}, oracle {b.dtype})"
            break
    if mismatch: fails.append((name, mismatch))
    else: passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
for n, m in fails:
    print(f"FAIL {n}: {m}")
# rows-only queries: just check rows>0
for d in sorted(glob.glob(f"{out_dir}/q*")):
    name = os.path.basename(d)
    if name in oracle or not os.path.isdir(d): continue
    try:
        n = len(pd.read_parquet(d))
        print(f"ROWS-ONLY {name}: rows={n}{' *** EMPTY ***' if n == 0 else ''}")
    except Exception as e:
        print(f"ROWS-ONLY {name}: read error {e}")
sys.exit(1 if fails else 0)
