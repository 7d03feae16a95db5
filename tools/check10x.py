#!/usr/bin/env python3
"""10x-scale variant of check.py: same canonicalize-and-compare logic, but
each DuckDB oracle runs in its own subprocess with a per-query timeout —
at 10x the data, a few oracle formulations (e.g. the recursive-CTE
transitive closure) are themselves super-linear in DuckDB and would grind
for hours. A timed-out ORACLE is recorded as ORACLE_TIMEOUT with a
rows-sanity note (the Spark side already produced output); it is an
oracle-harness limit, not an engine failure.

Oracles run WORKERS at a time (PRAGMA threads=4 each) so one slow oracle
doesn't serialize the suite. If the summary file already exists, names
with status "ok" are carried over and skipped (resume aid).

Usage: python3 tools/check10x.py [sfdir] [outdir] [timeout_s] [summary.json]
"""
import sys, json, math, glob, os, time, multiprocessing as mp

WORKERS = int(os.environ.get("CHECK10X_WORKERS", "8"))

# Per-query timeout multipliers (r17): the r16 "iterative graph wall"
# exclusions were a BUDGET problem, not a feasibility wall — q_pagerank's
# 5-iteration oracle completes in ~6 min at the 100x replica on 8 threads
# (probed 2026-08-16), it just doesn't fit the default per-query budget
# when 8 workers contend. These multipliers buy the handful of known-heavy
# oracles a longer leash without slowing the other ~260.
HEAVY = {
    "q_pagerank": 6, "q_ppr_seeded": 6, "q_hits": 6, "q_bfs_hops": 6,
    "q_ktruss": 6, "q_fuzzy_join": 6, "q_jw_link": 6,
    "ann_pq": 4, "ann_ivfpq": 4,
    "dedup_embedding_cosine": 8, "knn_l2_batched": 8,
    # r18: timed out at the default budget in the r17 gate while its
    # spark side produced its single row — the oracle's blocking-recall
    # CTE is join-heavy at the replica, a budget wall not a feasibility one
    "q_blocking_quality": 6,
}


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


def run_oracle(sfdir, sql, q):
    import duckdb
    con = duckdb.connect()
    con.execute("PRAGMA threads=4")
    for p in glob.glob(f"{sfdir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")
    try:
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        rows = res.fetchall()
        q.put(("ok", cols, rows))
    except Exception as e:
        q.put(("err", str(e), None))


def compare(name, outdir, status, a, b, summary):
    """Compare one finished oracle result against the Spark parquet."""
    import pyarrow.parquet as pq
    if status == "err":
        print(f"FAIL {name}: oracle error: {a}", flush=True)
        summary[name] = {"status": "oracle_error", "err": a}
        return 1
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    t = pq.read_table(files[0])
    scols = t.column_names
    srows = [tuple(r[c] for c in scols) for r in t.to_pylist()]
    oc, orws = canon(a, b)
    sc, srws = canon(scols, srows)
    if oc != sc:
        print(f"FAIL {name}: schema mismatch oracle={oc} spark={sc}", flush=True)
        summary[name] = {"status": "schema_mismatch"}
        return 1
    if len(orws) != len(srws):
        print(f"FAIL {name}: rows oracle={len(orws)} spark={len(srws)}", flush=True)
        summary[name] = {"status": "row_count_mismatch",
                         "oracle_rows": len(orws), "spark_rows": len(srws)}
        return 1
    bad = [(x, y) for x, y in zip(orws, srws) if x != y]
    if bad:
        print(f"FAIL {name}: {len(bad)}/{len(orws)} rows differ; "
              f"first: oracle={bad[0][0]} spark={bad[0][1]}", flush=True)
        summary[name] = {"status": "hash_mismatch", "rows_differ": len(bad)}
        return 1
    print(f"OK   {name}: {len(orws)} rows", flush=True)
    summary[name] = {"status": "ok", "rows": len(orws)}
    return 0


def spark_rows(outdir, name):
    import pyarrow.parquet as pq
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    return pq.read_table(files[0]).num_rows if files else -1


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_10x"
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    summary_path = sys.argv[4] if len(sys.argv) > 4 else "/tmp/scale10x_correctness.json"

    with open(f"{outdir}/oracle_sql.json") as f:
        oracle = json.load(f)

    summary = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            prev = json.load(f).get("queries", {})
        for k, v in prev.items():
            if v.get("status") == "ok" and k in oracle:
                summary[k] = v
                print(f"SKIP {k}: ok in previous summary", flush=True)

    fails = 0
    pending = []
    for name, sql in sorted(oracle.items()):
        if name in summary:
            continue
        if not glob.glob(f"{outdir}/{name}/*.parquet"):
            print(f"FAIL {name}: no spark output", flush=True)
            summary[name] = {"status": "no_spark_output"}
            fails += 1
            continue
        pending.append((name, sql))

    running = {}  # name -> (proc, queue, deadline)
    while pending or running:
        while pending and len(running) < WORKERS:
            name, sql = pending.pop(0)
            q = mp.Queue()
            proc = mp.Process(target=run_oracle, args=(sfdir, sql, q))
            proc.start()
            running[name] = (proc, q, time.time() + timeout * HEAVY.get(name, 1))
        done = []
        for name, (proc, q, deadline) in running.items():
            if not q.empty():
                status, a, b = q.get()
                proc.join()
                fails += compare(name, outdir, status, a, b, summary)
                done.append(name)
            elif not proc.is_alive() and q.empty():
                print(f"FAIL {name}: oracle process died", flush=True)
                summary[name] = {"status": "oracle_crash"}
                fails += 1
                done.append(name)
            elif time.time() > deadline:
                # SIGKILL, not SIGTERM: a DuckDB worker deep in a native
                # pipeline ignores terminate() and the join() would hang
                # the whole gate (observed r17: three workers wedged 1-2h
                # past deadline)
                proc.kill()
                proc.join(30)
                n = spark_rows(outdir, name)
                print(f"ORACLE_TIMEOUT {name}: oracle exceeded {timeout}s in "
                      f"DuckDB (spark rows={n})", flush=True)
                summary[name] = {"status": "oracle_timeout", "spark_rows": n}
                done.append(name)
        for name in done:
            del running[name]
        if not done:
            time.sleep(1)

    n_ok = sum(1 for v in summary.values() if v["status"] == "ok")
    n_to = sum(1 for v in summary.values() if v["status"] == "oracle_timeout")
    print(f"SUMMARY: {n_ok} ok, {n_to} oracle_timeout, {fails} fail "
          f"of {len(summary)}", flush=True)
    with open(summary_path, "w") as f:
        json.dump({"sfdir": sfdir, "timeout_s": timeout, "ok": n_ok,
                   "oracle_timeout": n_to, "fail": fails,
                   "queries": summary}, f, indent=1, sort_keys=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
