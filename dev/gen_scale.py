#!/usr/bin/env python3
"""Dev-only scale-step generator: builds sfN' = K x sfN from an existing
driver-generated SF directory by concatenating K key-shifted copies of each
table, preserving parquet schemas exactly — whatever vintage the source has
(events.ts was INT64 TIMESTAMP(NANOS) pre-2026-08-13, TIMESTAMP(MICROS) NTZ
since; graft.Tables normalizes both at load).
Used for the 10x scale-step bench evidence in NOTES.md. NOT part of the
engine; the engine never reads anything derived from this at verify time.

Copy 0 is byte-identical to the source. For copy c >= 1:
  - fact/dim keys shift by c * SHIFT so each copy's FK graph stays closed
    onto itself (customer<-orders<-lineitem, part/supplier<-lineitem);
  - nation/region (fixed TPC-H dims) are NOT replicated;
  - events shift event_id by a multiple of lcm(211, 20) = 4220 and user_id
    by a multiple of 50, so the derived op/http/external_id mixes of
    WagerBook.commandsFromEvents are preserved per copy;
  - documents get a per-copy suffix token so copies are near-dups, not
    exact dups (exact-dedup prepasses would otherwise erase the scale-up),
    with n_chars updated to match;
  - embeddings shift vec_id by a multiple of 20 (query stride).

Usage: python3 dev/gen_scale.py <srcSfDir> <dstDir> [K=10]
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc
import os

src, dst = sys.argv[1], sys.argv[2]
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)

SHIFT = 10_000_000          # multiple of 20 and 50
EVENT_SHIFT = 10_001_400    # multiple of 4220 = lcm(211, 20)

def shift(table, col, delta):
    i = table.schema.get_field_index(col)
    shifted = pc.add(table.column(col), pa.scalar(delta, type=table.schema.field(col).type))
    return table.set_column(i, table.schema.field(col), shifted)

def copies(name, fn):
    t0 = pq.read_table(f"{src}/{name}.parquet")
    parts = [t0] + [fn(t0, c) for c in range(1, K)]
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/{name}.parquet")
    print(f"{name}: {t0.num_rows} -> {out.num_rows}")

def keyshift(cols, delta=SHIFT):
    def fn(t, c):
        for col in cols:
            t = shift(t, col, c * delta)
        return t
    return fn

def docs_fn(t, c):
    t = shift(t, "doc_id", c * SHIFT)
    suffix = f" copyvariant{c}"
    text = pc.binary_join_element_wise(t.column("text").cast(pa.string()),
                                       pa.scalar(suffix), pa.scalar(""))
    i = t.schema.get_field_index("text")
    t = t.set_column(i, t.schema.field("text"), text.cast(t.schema.field("text").type))
    n = pc.add(t.column("n_chars"), pa.scalar(len(suffix), type=pa.int64()))
    j = t.schema.get_field_index("n_chars")
    return t.set_column(j, t.schema.field("n_chars"), n)

copies("customer", keyshift(["c_custkey"]))
copies("orders", keyshift(["o_orderkey", "o_custkey"]))
copies("lineitem", keyshift(["l_orderkey", "l_partkey", "l_suppkey"]))
copies("part", keyshift(["p_partkey"]))
copies("supplier", keyshift(["s_suppkey"]))
copies("events", lambda t, c: shift(shift(t, "event_id", c * EVENT_SHIFT),
                                    "user_id", c * SHIFT))
copies("documents", docs_fn)
copies("embeddings", keyshift(["vec_id"]))
for name in ("nation", "region"):
    t = pq.read_table(f"{src}/{name}.parquet")
    pq.write_table(t, f"{dst}/{name}.parquet")
    print(f"{name}: {t.num_rows} (fixed dim, not replicated)")
