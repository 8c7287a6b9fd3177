#!/usr/bin/env python3
"""Dev-only pre-check that mimics the driver's DuckDB-oracle compare:
run graft.Verify first (writes <out>/<name>/ parquet + oracle_sql.json),
then this script replays every oracle SQL in DuckDB over the same sf tables
and diffs values column-sorted / row-sorted. NOT part of the engine.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir> [skip1,skip2,…]

The optional skip list names queries whose ORACLE is too expensive at the
target SF (e.g. pipeline_decontam_topk's intentionally-quadratic brute
baseline at sf1); each skipped name is reported as SKIP, never silently.
Set CHECK_ORACLE_VERBOSE=1 for per-query progress + timing on stderr.
Set CHECK_ORACLE_RESULTS=<path.jsonl> to checkpoint one JSON line per
query as it finishes (pass/fail + timing) AND to resume: queries already
recorded as PASSING in that file are not re-checked; recorded FAILURES are
re-run (so a fix is picked up without editing the jsonl). Long sf1 runs
survive a kill.
"""
import json, sys, glob, os, time
import duckdb

sf, out = sys.argv[1], sys.argv[2]
skip = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
verbose = os.environ.get("CHECK_ORACLE_VERBOSE") == "1"
results_path = os.environ.get("CHECK_ORACLE_RESULTS")
done = {}
if results_path and os.path.exists(results_path):
    with open(results_path) as f:
        for line in f:
            rec = json.loads(line)
            # Resume skips only recorded passes; a recorded failure is
            # re-checked so a fixed query stops reporting the stale FAIL.
            if rec["ok"]:
                done[rec["name"]] = rec

def record(name, ok, msg, secs):
    if results_path:
        with open(results_path, "a") as f:
            f.write(json.dumps({"name": name, "ok": ok, "msg": msg,
                                "secs": round(secs, 1)}) + "\n")
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails, passes, skipped = [], [], []
for name, sql in sorted(oracle.items()):
    if name in skip:
        skipped.append(name); continue
    if name in done:
        # `done` holds PASSES only (see the resume loader above): a query
        # present here was recorded green and is skipped; recorded failures
        # were never loaded, so they always re-run and a fix clears them.
        passes.append(name)
        continue
    t0 = time.time()
    if verbose:
        print(f"[check] {name} ...", file=sys.stderr, flush=True)
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output"))
        record(name, False, "no spark output", 0); continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}"))
        record(name, False, f"duckdb error: {e}", time.time()-t0); continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        msg = f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}"
        fails.append((name, msg)); record(name, False, msg, time.time()-t0); continue
    if len(exp) != len(got):
        msg = f"rowcount differ: oracle={len(exp)} spark={len(got)}"
        fails.append((name, msg)); record(name, False, msg, time.time()-t0); continue
    if len(exp) == 0:
        passes.append(name + "(empty)")
        record(name, True, "empty", time.time()-t0); continue
    exp_s = exp.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values().reset_index(drop=True)
    got_s = got.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values().reset_index(drop=True)
    if verbose:
        print(f"[check] {name} done in {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    if len(exp) == 0 or exp_s.equals(got_s):
        passes.append(name)
        record(name, True, None, time.time()-t0)
    else:
        diff = (exp_s != got_s)
        i = diff.idxmax()
        msg = f"values differ at sorted-row {i} ({diff.sum()} rows):\n  oracle: {exp_s[i][:300]}\n  spark : {got_s[i][:300]}"
        fails.append((name, msg))
        record(name, False, msg, time.time()-t0)

print(f"PASS {len(passes)}: {' '.join(passes)}")
if skipped:
    print(f"SKIP {len(skipped)}: {' '.join(skipped)}")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
sys.exit(1 if fails else 0)
