#!/usr/bin/env python3
"""Dev-only assembler for the committed sf1 correctness artifact.

Reads the per-query jsonl checkpoint that dev/check_oracle.py (with
CHECK_ORACLE_RESULTS) and dev/check_closure_sf1.py both append to, adds
each query's dumped rowcount from the Verify output, and writes the
artifact JSON keyed by query name — the recorded evidence that the full
board passes its oracles at sf1, not just at the driver's sf0.01.

Skipped oracles (named on the check_oracle command line) are recorded
explicitly with the reason passed via --skip-reason so the artifact never
silently under-reports.

Usage: python3 dev/make_correctness_sf1.py <verifyOutDir> <resultsJsonl> \
           <outJson> [skipName=reason ...]
"""
import glob
import json
import sys

import pyarrow.parquet as pq

out_dir, results_path, out_json = sys.argv[1], sys.argv[2], sys.argv[3]
skip_reasons = dict(a.split("=", 1) for a in sys.argv[4:])

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

rows = {}
with open(results_path) as f:
    for line in f:
        rec = json.loads(line)
        rows[rec["name"]] = rec  # later lines win (re-runs after fixes)

queries = {}
for name in sorted(oracle):
    spark_rows = None
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if files:
        spark_rows = sum(pq.ParquetFile(p).metadata.num_rows for p in files)
    if name in rows:
        rec = rows[name]
        queries[name] = {
            "ok": rec["ok"],
            "method": rec.get("method", "duckdb_compare"),
            "spark_rows": spark_rows,
            "secs": rec.get("secs"),
            "err": None if rec["ok"] else rec.get("msg"),
        }
    elif name in skip_reasons:
        queries[name] = {
            "ok": None,
            "method": "skipped",
            "spark_rows": spark_rows,
            "secs": None,
            "err": skip_reasons[name],
        }
    else:
        queries[name] = {
            "ok": False,
            "method": "missing",
            "spark_rows": spark_rows,
            "secs": None,
            "err": "no result recorded",
        }

n_ok = sum(1 for q in queries.values() if q["ok"] is True)
n_fail = sum(1 for q in queries.values() if q["ok"] is False)
n_skip = sum(1 for q in queries.values() if q["ok"] is None)
artifact = {
    "summary": {
        "queries": len(queries),
        "pass": n_ok,
        "fail": n_fail,
        "skip": n_skip,
    },
    "queries": queries,
}
with open(out_json, "w") as f:
    json.dump(artifact, f, indent=1)
print(f"{out_json}: {n_ok} pass / {n_fail} fail / {n_skip} skip "
      f"of {len(queries)}")
sys.exit(1 if n_fail else 0)
