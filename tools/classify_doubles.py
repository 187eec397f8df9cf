#!/usr/bin/env python3
"""Float-policy audit: classify every DOUBLE oracle output column.

Usage: python3 tools/classify_doubles.py <oracle_sql.json> [out.tsv]

DESCRIBEs every declared oracle against the sf0.01 fixture views and,
for each DOUBLE output column, classifies the expression that produces
it (the last `AS <col>` alias window in the SQL twin):

  edge-div / edge-round / edge-cast  mechanically safe: exact integer /
        decimal arithmetic with a single cast-to-double + division /
        round at the output edge (the q70/q93 policy shape).
  transcendental  exp/ln/log/pow appears in the window — needs a manual
        check that the transcendental runs per-row / per-group on
        cross-engine-identical inputs and that no FLOAT fold crosses
        rows afterward (the q226/q234 risk class).
  float-fold      a SUM/AVG over a ::DOUBLE expression — manual check:
        safe only when every summand is an exactly-representable
        integer (0/1 indicators, integer counts < 2^53).
  passthrough? / other  no alias window found / unmatched shape —
        manual check.

The classifier is a regex heuristic: it exists to SHRINK the manual
audit to the flagged classes, not to replace it.  The adjudicated
verdicts live in ARCHITECTURE.md's float-policy audit table; the raw
per-column output is committed as tools/float_audit.tsv.
"""
import json, re, sys, glob
from collections import Counter

import duckdb

oracle_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out/oracle_sql.json"
out_path = sys.argv[2] if len(sys.argv) > 2 else "tools/float_audit.tsv"
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(oracle_path))
rows = []
for q, sql in sorted(oracle.items()):
    try:
        desc = con.execute("DESCRIBE " + sql).fetchall()
    except Exception as e:
        print("ERR", q, e)
        continue
    for c, t, *_ in desc:
        if t == "DOUBLE":
            rows.append((q, c, sql))

def expr_for(col, sql):
    ms = list(re.finditer(r"AS\s+" + re.escape(col) + r"\b", sql, re.I))
    if not ms:
        return ""
    m = ms[-1]
    return sql[max(0, m.start() - 400):m.start()]

TRANS = re.compile(r"\b(exp|ln|log|log2|log10|pow|power)\s*\(", re.I)

def classify(expr):
    e = expr.lower()
    if not e:
        return "passthrough?"
    has_round = re.search(r"round\s*\(", e) is not None
    n_div = e.count("/") - e.count("//") * 2
    if TRANS.search(e):
        return "transcendental"
    if re.search(r"(sum|avg|min|max)\s*\([^)]*::\s*double", e) or \
       re.search(r"(sum|avg)\s*\([^)]*\bdouble\b", e):
        return "float-fold"
    if has_round and n_div >= 1:
        return "edge-div"
    if has_round:
        return "edge-round"
    if "::double" in e or "as double" in e:
        return "edge-cast"
    return "other"

cnt = Counter()
out = []
for q, c, sql in rows:
    k = classify(expr_for(c, sql))
    cnt[k] += 1
    out.append((q, c, k))

print(len(rows), "DOUBLE columns across", len({q for q, _, _ in out}), "queries")
for k, n in sorted(cnt.items()):
    print(f"  {k:15s} {n}")
with open(out_path, "w") as f:
    f.write("# query\tcolumn\tclass (regex heuristic; adjudication in ARCHITECTURE.md)\n")
    for q, c, k in out:
        f.write(f"{q}\t{c}\t{k}\n")
print("wrote", out_path)
