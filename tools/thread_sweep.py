#!/usr/bin/env python3
"""Order-perturbation sweep of every oracle: run each SparkEntry
oracle under DuckDB threads=1 and threads=8 (fresh connections) and
compare canonicalized results.

Why: the round-11 q196 flake proved an UNORDERED float fold inside the
oracle is nondeterministic across DuckDB's own thread schedules — the
same-settings sweeps in flake_repro.py only vary the schedule by luck,
while forcing a different thread count guarantees a different partial-
aggregation order. A query whose output differs between threads=1 and
threads=8 carries an order-sensitive fold that WILL eventually flip a
driver gate when its data lands on a rounding boundary.

threads=1 vs threads=8 is a strict superset of the morsel-order noise
the driver sees, so a clean sweep here is strong evidence the
zero-unordered-float-folds doctrine holds data-wide at this SF.

Usage: python3 tools/thread_sweep.py [sfDir] [outDir-with-oracle_sql.json]
"""
import glob
import json
import sys

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

oracle = json.load(open(f"{out}/oracle_sql.json"))


def run_all(threads):
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for p in glob.glob(f"{sf}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")
    res = {}
    for name, sql in sorted(oracle.items()):
        try:
            rows = con.execute(sql).fetchall()
            res[name] = sorted(repr(r) for r in rows)
        except Exception as e:
            res[name] = [f"ERROR: {e}"]
    con.close()
    return res


a = run_all(1)
print("[sweep] threads=1 pass done", flush=True)
b = run_all(8)
print("[sweep] threads=8 pass done", flush=True)

bad = []
for name in sorted(oracle):
    if a[name] != b[name]:
        bad.append(name)
        sa, sb = set(a[name]), set(b[name])
        print(f"[sweep] ORDER-SENSITIVE {name}: "
              f"{len(sa - sb)} rows only@1t, {len(sb - sa)} only@8t")
        for r in sorted(sa - sb)[:2]:
            print(f"    1t: {r[:160]}")
        for r in sorted(sb - sa)[:2]:
            print(f"    8t: {r[:160]}")
print(f"[sweep] RESULT: {len(bad)} order-sensitive oracles: {bad}")
