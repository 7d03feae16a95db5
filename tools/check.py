#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]

Runs DuckDB on each oracle_sql.json entry (tables = parquet files in sfdir),
loads the Spark-written parquet result for the same query, canonicalizes both
(sort columns by name, sort rows by all columns), and compares values.
"""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

with open(f"{outdir}/oracle_sql.json") as f:
    oracle = json.load(f)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(round(v, 9))
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in order], out

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        res = con.execute(sql)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    t = pq.read_table(files[0])
    scols = t.column_names
    srows = [tuple(r[c] for c in scols) for r in t.to_pylist()]
    oc, orws = canon(ocols, orows)
    sc, srws = canon(scols, srows)
    if oc != sc:
        print(f"FAIL {name}: schema mismatch oracle={oc} spark={sc}")
        fails += 1
        continue
    if len(orws) != len(srws):
        print(f"FAIL {name}: rows oracle={len(orws)} spark={len(srws)}")
        fails += 1
        continue
    bad = [(a, b) for a, b in zip(orws, srws) if a != b]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(orws)} rows differ; first: oracle={bad[0][0]} spark={bad[0][1]}")
        fails += 1
    else:
        print(f"OK   {name}: {len(orws)} rows")

sys.exit(1 if fails else 0)
