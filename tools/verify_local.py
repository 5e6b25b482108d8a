#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify via
sbt, then execute each oracle SQL in DuckDB over the same parquet tables
and compare (schema, row count, sorted-value hash). Usage:

    python3 tools/verify_local.py [sfdir] [outdir] [--skip-run] [queries...]
"""
import sys, os, json, subprocess, hashlib
import duckdb

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

def canon(rows, cols):
    # sort columns by name, then rows; hash the normalized repr
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = sorted(tuple(repr(r[i]) for i in idx) for r in rows)
    h = hashlib.sha256(repr(norm).encode()).hexdigest()[:16]
    return h, len(rows)

results = {}
names = sorted(only) if only else sorted(os.listdir(out))
for name in names:
    path = f"{out}/{name}"
    if not os.path.isdir(path):
        continue
    try:
        got = con.sql(f"SELECT * FROM '{path}/*.parquet'")
        gcols = [c.lower() for c in got.columns]
        grows = got.fetchall()
    except Exception as e:
        results[name] = f"SPARK-READ-FAIL {e}"
        continue
    if name not in oracle:
        results[name] = f"rows-only rows={len(grows)}"
        continue
    try:
        exp = con.sql(oracle[name])
        ecols = [c.lower() for c in exp.columns]
        erows = exp.fetchall()
    except Exception as e:
        results[name] = f"ORACLE-FAIL {str(e)[:200]}"
        continue
    if sorted(gcols) != sorted(ecols):
        results[name] = f"SCHEMA-MISMATCH spark={sorted(gcols)} duck={sorted(ecols)}"
        continue
    gh, gn = canon(grows, gcols)
    eh, en = canon(erows, ecols)
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
