#!/usr/bin/env python3
"""Gate lint: oracle output types must hash-canonicalize like Spark's.

The driver's correctness hasher canonicalizes DuckDB Arrow output and Spark
parquet output independently; a DuckDB column that materializes as
decimal128 (e.g. a raw window SUM(BIGINT) widened to HUGEINT) hashes
differently from Spark's int64 even when every value is identical
(round-7 q_global_running_sum). This lint fails on any oracle output column
whose Arrow type is decimal128/decimal256 while the Spark-side column for
the same query is not a decimal — i.e. exactly the class that ships red.

Usage: python3 tools/lint_oracle_types.py [sfdir] [outdir]
  sfdir: parquet tables dir (default /root/testdata/sf0.001)
  outdir: Verify output dir containing oracle_sql.json and per-query parquet
          (default /tmp/graft_verify_lint). Spark outputs are optional —
          without them, any decimal128 oracle column is flagged.
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_lint"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

with open(f"{outdir}/oracle_sql.json") as f:
    oracle = json.load(f)

def spark_types(name):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        return None
    schema = pq.read_schema(files[0])
    return {f.name: f.type for f in schema}

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        tbl = con.execute(sql).arrow()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    stypes = spark_types(name)
    for field in tbl.schema:
        t = field.type
        if pa.types.is_decimal(t):
            sp = stypes.get(field.name) if stypes else None
            if sp is None or not pa.types.is_decimal(sp):
                got = f"spark={sp}" if stypes else "spark output absent"
                print(f"FAIL {name}.{field.name}: oracle materializes {t} "
                      f"({got}) — CAST the oracle column so types agree")
                fails += 1

print(("LINT FAIL: %d column(s)" % fails) if fails else
      f"LINT OK: {len(oracle)} oracle queries, no decimal-widening mismatches")
sys.exit(1 if fails else 0)
