#!/usr/bin/env python3
"""Gate lint: fail loudly when the driver regenerates testdata with changed
physical parquet types.

Two silent regenerations have shipped red artifacts: round 7 (DuckDB HUGEINT
widening) and round 8 (events.ts TIMESTAMP(NANOS) -> timestamp[us], which
Spark reads as TIMESTAMP_NTZ and unix_micros/withWatermark reject). The
engine's read boundary (`Tables.events`) now normalizes every observed type,
but the NEXT re-type must surface in the builder's gate, not the driver's
artifacts.

Compares every column's physical Arrow type in the sf dir against the
committed snapshot `tools/testdata_schemas.json`.
  - exit 0: snapshot matches.
  - exit 1: drift. Prints each changed column. Re-run the FULL correctness
    gate, fix read boundaries if needed, then refresh the snapshot with
    --update.

Usage: python3 tools/lint_schema_drift.py [sfdir] [--update]
"""
import sys, json, glob, os
import pyarrow.parquet as pq

args = [a for a in sys.argv[1:] if a != "--update"]
update = "--update" in sys.argv[1:]
sfdir = args[0] if args else "/root/testdata/sf0.01"
snap_path = os.path.join(os.path.dirname(__file__), "testdata_schemas.json")

current = {}
for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
    name = os.path.basename(p)[:-8]
    current[name] = {f.name: str(f.type) for f in pq.read_schema(p)}

if update:
    with open(snap_path, "w") as f:
        json.dump(current, f, indent=2, sort_keys=True)
    print(f"snapshot written: {snap_path}")
    sys.exit(0)

if not os.path.exists(snap_path):
    # a missing snapshot is the one state where the tripwire MUST scream:
    # silently rewriting it here would pass trivially on a bad checkout
    print(f"ERROR: snapshot file absent: {snap_path}")
    print("The drift gate cannot run without its committed baseline.")
    print("Restore it from git, or (only if intentionally re-baselining)")
    print(f"run: python3 tools/lint_schema_drift.py {sfdir} --update")
    sys.exit(2)

with open(snap_path) as f:
    want = json.load(f)

drift = []
for t in sorted(set(want) | set(current)):
    if t not in current:
        drift.append(f"table MISSING: {t}")
        continue
    if t not in want:
        drift.append(f"table NEW (not in snapshot): {t}")
        continue
    for c in sorted(set(want[t]) | set(current[t])):
        w, g = want[t].get(c), current[t].get(c)
        if w != g:
            drift.append(f"{t}.{c}: snapshot={w} current={g}")

if drift:
    print("SCHEMA DRIFT — testdata physical types changed since the snapshot:")
    for d in drift:
        print(f"  {d}")
    print("Re-run the full correctness gate; fix read boundaries if needed;")
    print("then refresh with: python3 tools/lint_schema_drift.py", sfdir, "--update")
    sys.exit(1)
print(f"schema snapshot OK ({sum(len(v) for v in current.values())} columns, {len(current)} tables)")
