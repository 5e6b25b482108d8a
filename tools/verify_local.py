#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify via
sbt, then execute each oracle SQL in DuckDB over the same parquet tables
and compare (schema, row count, sorted-value hash). Usage:

    python3 tools/verify_local.py [sfdir] [outdir] [--skip-run] [queries...]
"""
import sys, os, json, subprocess, hashlib
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
flags = sys.argv[3:]
skip_run = "--skip-run" in flags
only = [f for f in flags if not f.startswith("--")]

if not skip_run:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=3600)
    tail = "\n".join((r.stdout + r.stderr).splitlines()[-30:])
    print(tail)
    if r.returncode != 0:
        sys.exit("verify run failed")

oracle = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

def canon(df):
    """Driver-faithful canonicalisation: pandas frame, columns lowercased
    and sorted by name, rows sorted by all columns (raises TypeError on
    array cells exactly like the driver), then a dtype-aware value hash —
    int64 vs float64/object (DuckDB HUGEINT) hash differently, matching
    the driver's behaviour that verify_local's old repr() hash hid.
    """
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    # hash_pandas_object is integer-width-insensitive (int32 == int64) but
    # int-vs-float sensitive — matching the driver (round-1: int32 rank
    # passed, HUGEINT-as-float64 failed). No dtype string in the hash.
    h = hashlib.sha256()
    for c in df.columns:
        h.update(pd.util.hash_pandas_object(df[c], index=False).values.tobytes())
    return h.hexdigest()[:16], len(df)

results = {}
names = sorted(only) if only else sorted(os.listdir(out))
for name in names:
    path = f"{out}/{name}"
    if not os.path.isdir(path):
        continue
    try:
        gdf = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
        gcols = sorted(c.lower() for c in gdf.columns)
    except Exception as e:
        results[name] = f"SPARK-READ-FAIL {e}"
        continue
    if name not in oracle:
        try:
            canon(gdf)  # rows-only results must still be sortable/hashable
        except Exception as e:
            results[name] = f"ROWS-ONLY-UNHASHABLE {type(e).__name__}: {str(e)[:120]}"
            continue
        results[name] = f"rows-only rows={len(gdf)}"
        continue
    try:
        edf = con.sql(oracle[name]).df()
        ecols = sorted(c.lower() for c in edf.columns)
    except Exception as e:
        results[name] = f"ORACLE-FAIL {str(e)[:200]}"
        continue
    if gcols != ecols:
        results[name] = f"SCHEMA-MISMATCH spark={gcols} duck={ecols}"
        continue
    try:
        gh, gn = canon(gdf)
        eh, en = canon(edf)
    except Exception as e:
        results[name] = f"CANON-FAIL {type(e).__name__}: {str(e)[:120]}"
        continue
    if gn != en:
        results[name] = f"ROWCOUNT-MISMATCH spark={gn} duck={en}"
    elif gh != eh:
        results[name] = f"HASH-MISMATCH rows={gn}"
    else:
        results[name] = f"OK rows={gn}"

npass = sum(1 for v in results.values() if v.startswith(("OK", "rows-only")))
for k in sorted(results):
    print(f"{k:24s} {results[k]}")
print(f"== {npass}/{len(results)} pass")
