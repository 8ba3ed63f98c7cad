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

def canon(tbl, float_both=frozenset()):
    """Canonicalize an Arrow table to a sorted pandas frame. For float
    columns present on BOTH sides, a parallel tag column ('null'/'nan'/
    '') is derived from the Arrow nullity BEFORE pandas collapses SQL
    NULL and NaN to one value — the multiset profile below cannot see a
    POSITIONAL swap (spark NULL where oracle NaN on row k and vice
    versa on row j), but the tag rides the row through the sort and the
    row-wise compare catches it (r13 review)."""
    import numpy as np
    import pyarrow.compute as pc
    df = tbl.to_pandas()
    for i, c in enumerate(tbl.column_names):
        if c not in float_both:
            continue
        col = tbl.column(i).combine_chunks()
        null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
        nan_mask = pc.is_nan(pc.fill_null(col, 0.0)).to_numpy(zero_copy_only=False)
        df["\x00nn\x00" + c] = np.where(null_mask, "null", np.where(nan_mask, "nan", ""))
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            # sentinel BEFORE astype(str): plain astype maps SQL NULL to
            # the 4-char string 'None', so a real NULL on one side and the
            # literal string 'None' on the other would compare equal
            df[c] = df[c].where(df[c].notna(), "\x00<NULL>\x00").astype(str)
    # sort by the REAL columns first, tag columns only as FINAL
    # tiebreakers: a tag in the primary sort keys would re-align rows
    # by tag and hide exactly the positional swap it exists to catch;
    # as a trailing tiebreaker it only reorders rows whose real columns
    # are fully equal — where a swap is not a real divergence
    real = [c for c in df.columns if not c.startswith("\x00nn\x00")]
    tags = [c for c in df.columns if c.startswith("\x00nn\x00")]
    return df.sort_values(by=real + tags).reset_index(drop=True)

def null_nan_profile(tbl):
    """Per-column (n_null, n_nan) from an Arrow table — pandas float64
    collapses SQL NULL and NaN both to NaN, so the row-wise compare
    below can't tell them apart; this multiset-level profile can."""
    import pyarrow.compute as pc
    prof = {}
    for i, c in enumerate(tbl.column_names):
        col = tbl.column(i)
        n_null = col.null_count
        n_nan = 0
        if pa_types.is_floating(col.type):
            n_nan = pc.sum(pc.is_nan(pc.drop_null(col.combine_chunks()))).as_py() or 0
        prof[c] = (n_null, n_nan)
    return prof

import pyarrow.parquet as pq_mod
import pyarrow.types as pa_types

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    try:
        got_tbl = pq_mod.read_table(spark_path)
        want_tbl = con.execute(sql).arrow()
        # tag columns only where BOTH sides are floating — a one-sided
        # tag would trip the columns-differ check on a dtype mismatch
        # that the dtype-aware compare below already reports properly
        float_both = frozenset(
            c for c in got_tbl.column_names if c in want_tbl.column_names
            and pa_types.is_floating(got_tbl.schema.field(c).type)
            and pa_types.is_floating(want_tbl.schema.field(c).type))
        got = canon(got_tbl, float_both)
        want = canon(want_tbl, float_both)
    except Exception as e:
        fails.append((name, f"load/exec error: {e}"))
        continue
    # NULL-vs-NaN cross-check: a Spark NaN where the oracle has SQL NULL
    # (corr on a zero-variance group, a NaN jaccard/cosine regression)
    # is a REAL divergence the float compare below would mask
    gp, wp = null_nan_profile(got_tbl), null_nan_profile(want_tbl)
    nn_bad = [f"col {c}: spark(null={gp[c][0]},nan={gp[c][1]}) oracle(null={wp[c][0]},nan={wp[c][1]})"
              for c in sorted(set(gp) & set(wp)) if gp[c] != wp[c]]
    if nn_bad:
        fails.append((name, f"NULL/NaN profile differs: {'; '.join(nn_bad)}"))
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
# rows-only queries: rows>0 is the gate, and their failures COUNT.
# Iterate the attempted-query manifest (queries.json), not the output
# directories: Verify clears each target before running, so a rows-only
# query that threw leaves no directory at all — globbing would skip it
# silently and exit 0 on a completely broken query.
manifest = f"{out_dir}/queries.json"
if os.path.exists(manifest):
    rows_only = [n for n in json.load(open(manifest)) if n not in oracle]
else:  # older dumps: fall back to whatever directories exist
    rows_only = [os.path.basename(d) for d in sorted(glob.glob(f"{out_dir}/q*"))
                 if os.path.isdir(d) and os.path.basename(d) not in oracle]
for name in sorted(rows_only):
    d = f"{out_dir}/{name}"
    if not os.path.isdir(d):
        fails.append((name, "no output written (query failed in Verify)"))
        print(f"ROWS-ONLY {name}: *** MISSING *** (query failed in Verify)")
        continue
    try:
        n = len(pd.read_parquet(d))
        print(f"ROWS-ONLY {name}: rows={n}{' *** EMPTY ***' if n == 0 else ''}")
        if n == 0:
            fails.append((name, "0 rows"))
    except Exception as e:
        print(f"ROWS-ONLY {name}: read error {e}")
        fails.append((name, f"read error: {e}"))
# an EMPTY run must not read as green: a typo'd SPARK_GRAFT_QUERIES
# subset filters everything out, leaving zero oracle entries and zero
# rows-only entries — 'PASS 0' with exit 0 would look like a passed gate
if not oracle and not rows_only:
    print("FAIL <gate>: zero queries checked (typo'd SPARK_GRAFT_QUERIES subset?)")
    sys.exit(1)
sys.exit(1 if fails else 0)
