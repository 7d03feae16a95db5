#!/usr/bin/env python3
"""Gate lint: declared query output types must hash-canonicalize identically.

Two classes ship red on the driver even when every VALUE is identical across
engines, so this lint rejects them structurally:

1. DECIMAL output columns, on EITHER side. Round 16 proved this: the kendall
   pair emitted exact integer witnesses typed DECIMAL(38,0) on both engines,
   passed tools/check.py at five scales, and still gated red — the driver
   canonicalizes decimal128 differently between its Spark-parquet and DuckDB
   paths. Hashed outputs must be BIGINT/STRING/BOOL/DATE (keep DECIMAL for
   internal accumulation; cast at the final select).

2. NEW floating-point output columns. 104 legacy double columns (pinned in
   tools/double_columns_allowlist.json) predate the integer-witness
   convention and have been green for 10+ rounds; they stay allowed. Any
   double column NOT in the allowlist fails — new emissions must use the
   floor(x*1e6+0.5) BIGINT witness convention (see MEMORY: never emit a
   double or decimal in a hashed output column).

Usage: python3 tools/lint_oracle_types.py [sfdir] [outdir]
  sfdir: parquet tables dir (default /root/testdata/sf0.001)
  outdir: Verify output dir containing oracle_sql.json and per-query parquet
          (default /tmp/graft_verify_lint). Spark outputs are optional —
          oracle-side checks run regardless; Spark-side checks need them.
"""
import sys, json, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_lint"
here = os.path.dirname(os.path.abspath(__file__))

with open(os.path.join(here, "double_columns_allowlist.json")) as f:
    DOUBLE_OK = {tuple(x) for x in json.load(f)}

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
def fail(msg):
    global fails
    print("FAIL " + msg)
    fails += 1

for name, sql in sorted(oracle.items()):
    try:
        tbl = con.execute(sql).arrow()
    except Exception as e:
        fail(f"{name}: oracle error: {e}")
        continue
    stypes = spark_types(name)
    for field in tbl.schema:
        t = field.type
        if pa.types.is_decimal(t):
            fail(f"{name}.{field.name}: oracle emits {t} — decimal outputs "
                 f"gate red even when values match (kendall, r16); CAST the "
                 f"final select to BIGINT on both sides")
        elif pa.types.is_floating(t) and (name, field.name) not in DOUBLE_OK:
            fail(f"{name}.{field.name}: oracle emits NEW double column — use "
                 f"the floor(x*1e6+0.5) BIGINT witness convention (or, if "
                 f"genuinely exact-rational, extend the pinned allowlist "
                 f"with a justification)")
    if stypes:
        for cname, sp in stypes.items():
            if pa.types.is_decimal(sp):
                fail(f"{name}.{cname}: Spark side emits {sp} — cast the "
                     f"final select to LongType")
            elif pa.types.is_floating(sp) and (name, cname) not in DOUBLE_OK:
                fail(f"{name}.{cname}: Spark side emits NEW double column — "
                     f"use the BIGINT witness convention")

print(("LINT FAIL: %d column(s)" % fails) if fails else
      f"LINT OK: {len(oracle)} oracle queries, no decimal outputs, "
      f"no unpinned double outputs")
sys.exit(1 if fails else 0)
