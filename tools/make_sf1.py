#!/usr/bin/env python3
"""Build the sf1 (10x) scaling-study corpus from sf0.1.

Replication with CONSTANT DUPLICATION RATE (the r12 BENCH_NOTES
method — naive row replication would grow dedup pair counts
quadratically in the replication factor and poison the scaling
exponents):

 - documents: replica r prefixes every word with ``r{r}`` (replica 0
   is the identity), so cross-replica shingle/band spaces are
   disjoint; doc_id shifts by r * (max+1); n_chars recomputed (the
   n_chars == len(text) contract must survive).
 - embeddings: replica r rotates the component vector by r positions
   (norm-preserving, cross-replica decorrelated); vec_id shifts.
 - events: user/event ids shift per replica — (user_id, ts) stays
   collision-free; ts untouched so the window/watermark shapes are
   identical per replica.
 - lineitem (r13 addition, for the g17/st11 CDC legs): l_orderkey
   shifts by r * 100_000_000 — divisible by 10, so every %2 / %10
   key-class pattern the CDC scenario carves is preserved per
   replica and the workload scales linearly.

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir] [factor]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import os
    os.makedirs(dst, exist_ok=True)

    docs = pq.read_table(f"{src}/documents.parquet").to_pylist()
    doc_shift = max(d["doc_id"] for d in docs) + 1
    out = []
    for r in range(factor):
        for d in docs:
            text = d["text"] if r == 0 else " ".join(
                f"r{r}{w}" for w in d["text"].split())
            out.append({"doc_id": d["doc_id"] + r * doc_shift,
                        "text": text, "lang": d["lang"],
                        "source": d["source"], "n_chars": len(text)})
    schema = pq.read_schema(f"{src}/documents.parquet")
    pq.write_table(pa.Table.from_pylist(out, schema=schema),
                   f"{dst}/documents.parquet")
    print(f"documents: {len(docs)} -> {len(out)}")

    emb = pq.read_table(f"{src}/embeddings.parquet").to_pylist()
    vec_shift = max(e["vec_id"] for e in emb) + 1
    out = []
    for r in range(factor):
        for e in emb:
            v = e["embedding"]
            k = r % len(v)
            out.append({"vec_id": e["vec_id"] + r * vec_shift,
                        "embedding": v[k:] + v[:k], "label": e["label"]})
    schema = pq.read_schema(f"{src}/embeddings.parquet")
    pq.write_table(pa.Table.from_pylist(out, schema=schema),
                   f"{dst}/embeddings.parquet")
    print(f"embeddings: {len(emb)} -> {len(out)}")

    ev = pq.read_table(f"{src}/events.parquet")
    n = ev.num_rows
    ev_shift = pa.compute.max(ev["event_id"]).as_py() + 1
    u_shift = pa.compute.max(ev["user_id"]).as_py() + 1
    parts = []
    for r in range(factor):
        t = ev
        t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                         pa.compute.add(t["event_id"], r * ev_shift))
        t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                         pa.compute.add(t["user_id"], r * u_shift))
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{dst}/events.parquet")
    print(f"events: {n} -> {n * factor}")

    # Key-domain shifts shared across tables so every join keeps its
    # per-replica match rate (a join gone match-free would change the
    # workload shape, not just its size). All shifts divisible by 10
    # so %2/%4/%10 key-class patterns survive per replica.
    ORDER_SHIFT = 100_000_000
    CUST_SHIFT = 10_000_000
    SUPP_SHIFT = 1_000_000
    PART_SHIFT = 10_000_000

    def replicate(name: str, shifts: dict) -> None:
        t0 = pq.read_table(f"{src}/{name}.parquet")
        parts = []
        for r in range(factor):
            t = t0
            for col, per in shifts.items():
                t = t.set_column(t.schema.get_field_index(col), col,
                                 pa.compute.add(t[col], r * per))
            parts.append(t)
        pq.write_table(pa.concat_tables(parts), f"{dst}/{name}.parquet")
        print(f"{name}: {t0.num_rows} -> {t0.num_rows * factor}")

    replicate("lineitem", {"l_orderkey": ORDER_SHIFT,
                           "l_suppkey": SUPP_SHIFT,
                           "l_partkey": PART_SHIFT})
    replicate("orders", {"o_orderkey": ORDER_SHIFT,
                         "o_custkey": CUST_SHIFT})
    replicate("customer", {"c_custkey": CUST_SHIFT})
    replicate("supplier", {"s_suppkey": SUPP_SHIFT})
    replicate("part", {"p_partkey": PART_SHIFT})

    # nation/region are true dimensions: keys referenced by every
    # replica, kept verbatim (their scan cost is noise at any sf)
    for name in ("nation", "region"):
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{dst}/{name}.parquet")
        print(f"{name}: copied")


if __name__ == "__main__":
    main()
