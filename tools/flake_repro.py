#!/usr/bin/env python3
"""Reproducer for the single-session DuckDB oracle flake (round-7 q248).

The driver's gate runs all 256 oracle SQL statements through ONE
long-lived DuckDB connection.  Twice now (builder r7 gate, driver r7
gate) exactly one query's hash flipped in that shape and was green on
every rerun — rows and schema matching, values transiently off.  This
script reproduces the driver's shape in a loop:

  one connection -> register sf views -> run every oracle -> hash each
  result -> repeat N sweeps -> report any query whose hash is not
  bit-identical across all sweeps (plus WHICH rows differed).

Usage: python3 tools/flake_repro.py [sfDir] [outDir] [sweeps]

Hash mimics the driver: columns sorted by name, row tuples sorted,
md5 over the python-value repr stream.
"""
import glob
import hashlib
import json
import sys
import time

import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
sweeps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(oracle)
print(f"[repro] {len(names)} oracles, {sweeps} sweeps, one session, sf={sf}",
      flush=True)


def run_hash(sql):
    t = con.execute(sql).fetch_arrow_table()
    cols = sorted(t.column_names)
    rows = sorted(tuple(repr(r[c]) for c in cols) for r in t.to_pylist())
    h = hashlib.md5()
    for r in rows:
        for v in r:
            h.update(v.encode())
            h.update(b"\x00")
        h.update(b"\x01")
    return h.hexdigest(), rows


baseline = {}      # name -> (hash, rows) from sweep 0
flips = {}         # name -> list of (sweep, hash)
for s in range(sweeps):
    t0 = time.time()
    for name in names:
        try:
            hsh, rows = run_hash(oracle[name])
        except Exception as e:
            print(f"[repro] sweep {s} {name}: ERROR {e}", flush=True)
            flips.setdefault(name, []).append((s, f"ERROR {e}"))
            continue
        if name not in baseline:
            baseline[name] = (hsh, rows)
        elif hsh != baseline[name][0]:
            flips.setdefault(name, []).append((s, hsh))
            base_rows = baseline[name][1]
            diff = [(a, b) for a, b in zip(base_rows, rows) if a != b]
            print(f"[repro] FLIP sweep {s} {name}: hash {hsh} != "
                  f"{baseline[name][0]}; {len(diff)} differing rows; "
                  f"first: {diff[:2]}", flush=True)
    print(f"[repro] sweep {s} done in {time.time()-t0:.1f}s, "
          f"flips so far: {sorted(flips)}", flush=True)

if flips:
    print(f"[repro] RESULT: flipped queries: "
          f"{ {k: len(v) for k, v in flips.items()} }")
    sys.exit(1)
print(f"[repro] RESULT: {sweeps} sweeps x {len(names)} oracles clean — "
      f"no flips")
