#!/usr/bin/env python3
"""Dev-only staged oracle compare for the connected-components queries
(`dedup_clusters`, `dedup_embedding_clusters`, `dedup_survivor_quality`)
plus the 2.37M-row pair set (`dedup_embedding_lsh_mp`) at large SF, where
DuckDB's RECURSIVE-CTE closure re-evaluates the (heavy) pair stage per
iteration and never finishes.

Semantics preserved exactly: the oracle's recursive `reach` +
`least(node, min(reached))` IS "label every node that appears in an edge
with its component's minimum id". We materialize the pair stage ONCE in
DuckDB (same SQL text the oracle embeds), run union-find in Python over
the edges, and compare with the same column-sorted / row-sorted string
compare check_oracle.py uses. NOT part of the engine.

Usage: python3 dev/check_closure_sf1.py <sfDir> <verifyOutDir>
"""
import json, os, sys, glob, time
import duckdb

sf, out = sys.argv[1], sys.argv[2]
# Same checkpoint file check_oracle.py appends to (CHECK_ORACLE_RESULTS),
# so one jsonl feeds make_correctness_sf1.py for the whole board.
results_path = os.environ.get("CHECK_ORACLE_RESULTS", "/tmp/sf1_results.jsonl")
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))


def pair_stage_sql(name):
    """Strip the recursive closure wrapper, leaving a standalone statement
    that yields the pair set the oracle's `edges` CTE consumes."""
    sql = oracle[name]
    if name == "dedup_embedding_lsh_mp":
        return sql, ("vec_a", "vec_b")   # the oracle IS the pair stage
    cut = sql.index(",\nedges AS")
    head = sql[:cut]
    if name in ("dedup_clusters", "dedup_survivor_quality"):
        # WITH RECURSIVE pairs AS ( <standalone statement> ) …
        inner = head[head.index("(") + 1:].rstrip()
        assert inner.endswith(")"), inner[-80:]
        return inner[:-1], ("doc_a", "doc_b")
    # embedding flavor: WITH RECURSIVE e AS (…) … lshp AS (…)
    return head.replace("WITH RECURSIVE", "WITH", 1) + "\nSELECT * FROM lshp", \
        ("vec_a", "vec_b")


def compare(name, exp):
    files = glob.glob(f"{out}/{name}/*.parquet")
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        return f"columns differ: oracle={list(exp.columns)} spark={list(got.columns)}"
    if len(exp) != len(got):
        return f"rowcount differ: oracle={len(exp)} spark={len(got)}"
    e = exp.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values().reset_index(drop=True)
    g = got.astype(str).apply(lambda r: "\x1f".join(r), axis=1).sort_values().reset_index(drop=True)
    if e.equals(g):
        return None
    i = (e != g).idxmax()
    return f"values differ at sorted-row {i}:\n  oracle: {e[i][:300]}\n  spark : {g[i][:300]}"


def components(edges):
    """Union-find; returns {node: component-min} for nodes with ≥1 edge."""
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {v: find(v) for v in parent}


# Queries whose docs-prep tail embeds the closure mid-chain (flat CTE
# list: … pairs, edges, reach, comp, dropq, …). The splice materializes
# the head once for the pair set, union-finds in Python, then re-runs
# head + `comp AS (SELECT * FROM comp_py)` + the tail from `,\ndropq AS`
# — the recursive reach (and the now-unreferenced pairs chain) drop out.
PREPPED = ["pipeline_docs_prep", "pipeline_curate_full",
           "pipeline_crawl_to_trainer"]

fails = 0
for name in ["dedup_embedding_lsh_mp", "dedup_clusters",
             "dedup_embedding_clusters", "dedup_survivor_quality",
             *PREPPED]:
    t0 = time.time()
    if name in PREPPED:
        sql = oracle[name]
        head = sql[:sql.index(",\nedges AS")]
        pairs = con.execute(head + "\nSELECT doc_a, doc_b FROM pairs").fetchdf()
        print(f"[closure] {name}: pair stage {len(pairs)} rows in "
              f"{time.time()-t0:.1f}s", file=sys.stderr, flush=True)
        lbl = components(zip(pairs["doc_a"].tolist(), pairs["doc_b"].tolist()))
        import pandas as pd
        comp_py = pd.DataFrame(sorted(lbl.items()), columns=["doc_id", "cluster"])
        con.register("comp_py", comp_py)
        exp = con.execute(head + ",\ncomp AS (SELECT * FROM comp_py)"
                          + sql[sql.index(",\ndropq AS"):]).fetchdf()
        msg = compare(name, exp)
        secs = round(time.time() - t0, 1)
        if msg:
            fails += 1
            print(f"FAIL {name}: {msg}")
        else:
            print(f"PASS {name} ({secs}s, staged closure)")
        rec = {"name": name, "ok": msg is None,
               "msg": msg or "staged-closure compare", "secs": secs,
               "method": "staged_closure"}
        with open(results_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        continue
    psql, (ca, cb) = pair_stage_sql(name)
    pairs = con.execute(psql).fetchdf()
    print(f"[closure] {name}: pair stage {len(pairs)} rows in "
          f"{time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    if name == "dedup_embedding_lsh_mp":
        msg = compare(name, pairs)           # the pair set IS the output
    elif name == "dedup_survivor_quality":
        # Python union-find replaces the recursive closure; the oracle's
        # NON-recursive tail (quality + first_value window, everything from
        # `,\nq AS`) runs verbatim in DuckDB over the spliced `comp` table.
        lbl = components(zip(pairs[ca].tolist(), pairs[cb].tolist()))
        import pandas as pd
        comp_py = pd.DataFrame(sorted(lbl.items()), columns=["doc_id", "cluster"])
        con.register("comp_py", comp_py)
        tail = oracle[name]
        tail = tail[tail.index(",\nq AS"):]
        exp = con.execute(
            "WITH comp AS (SELECT * FROM comp_py)" + tail).fetchdf()
        msg = compare(name, exp)
    else:
        lbl = components(zip(pairs[ca].tolist(), pairs[cb].tolist()))
        idc = "doc_id" if name == "dedup_clusters" else "vec_id"
        import pandas as pd
        exp = pd.DataFrame(sorted(lbl.items()), columns=[idc, "cluster"])
        msg = compare(name, exp)
    secs = round(time.time() - t0, 1)
    if msg:
        fails += 1
        print(f"FAIL {name}: {msg}")
    else:
        print(f"PASS {name} ({secs}s, staged closure)")
    rec = {"name": name, "ok": msg is None,
           "msg": msg or "staged-closure compare", "secs": secs,
           "method": "staged_closure"}
    with open(results_path, "a") as f:
        f.write(json.dumps(rec) + "\n")
sys.exit(1 if fails else 0)
