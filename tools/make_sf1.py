#!/usr/bin/env python3
"""Synthesize /tmp/sf1 (10x sf0.1) for the scale soak (NOTES_r4).

The driver only ships sf{0.001,0.01,0.1}; the soak needs one more 10x
step. Each table is replicated 10x with disjoint key ranges (offset
k*10_000_000 per copy k, far above any sf0.1 key) and foreign keys
shifted consistently, so joins and group-bys scale 10x without
degenerate hot keys.

Content columns are made copy-distinct where identical replicas would
change a query's asymptotics rather than its scale:
  * documents.text: copy k>0 tags every word with '~k' — no shingle of
    copy k overlaps any other copy, so n-gram/minhash/simhash pair
    counts scale linearly (10x) instead of quadratically via
    10-sibling cliques; within-copy duplicate structure is preserved
    exactly. n_chars is recomputed.
  * embeddings.embedding: copy k>0 mixes each vector 50/50 with a
    pseudorandom partner (vec_id + 211*k mod N) — cosine to the
    original drops to ~0.7, below near-dup thresholds, so p11 output
    scales with the corpus, not with the replica count.

Physical parquet types are preserved (pyarrow, parquet 2.6: events.ts
stays timestamp[ns] — Spark reads it back as nanos-as-long exactly like
the driver-generated files).
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
# key offset per copy — must exceed the SOURCE's max key (chain soaks:
# sf0.1->sf1 uses the 10M default, sf1->sf10 needs ~1e9)
OFF = int(sys.argv[4]) if len(sys.argv) > 4 else 10_000_000

KEY_COLUMNS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def shifted(table: pa.Table, keys, k: int) -> pa.Table:
    for name in keys:
        i = table.schema.get_field_index(name)
        col = pc.add(table.column(name), pa.scalar(k * OFF, type=pa.int64()))
        table = table.set_column(i, table.schema.field(i), col.cast(table.schema.field(i).type))
    return table


def document_copy(table: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return table
    tag = f"~{k}"
    text = pc.binary_join_element_wise(
        pc.replace_substring(table.column("text"), " ", tag + " "), tag, "")
    n_chars = pc.utf8_length(text).cast(pa.int64())
    t = table.set_column(table.schema.get_field_index("text"),
                         table.schema.field("text"), text)
    return t.set_column(t.schema.get_field_index("n_chars"),
                        t.schema.field("n_chars"), n_chars)


def embedding_copy(table: pa.Table, k: int) -> pa.Table:
    if k == 0:
        return table
    vecs = table.column("embedding").to_pylist()
    n = len(vecs)
    mixed = []
    for i, v in enumerate(vecs):
        p = vecs[(i + 211 * k) % n]
        mixed.append([0.5 * (a + b) for a, b in zip(v, p)])
    field = table.schema.field("embedding")
    return table.set_column(table.schema.get_field_index("embedding"), field,
                            pa.array(mixed, type=field.type))


def main():
    os.makedirs(DST, exist_ok=True)
    for name, keys in KEY_COLUMNS.items():
        src = pq.read_table(f"{SRC}/{name}.parquet")
        if not keys:  # broadcast dims stay as-is
            out = src
        else:
            copies = []
            for k in range(COPIES):
                t = shifted(src, keys, k)
                if name == "documents":
                    t = document_copy(t, k)
                elif name == "embeddings":
                    t = embedding_copy(t, k)
                copies.append(t)
            out = pa.concat_tables(copies)
        pq.write_table(out, f"{DST}/{name}.parquet", version="2.6",
                       coerce_timestamps=None, compression="snappy")
        print(f"{name}: {src.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
