#!/usr/bin/env python3
"""Generate an sf1-scale dataset by replicating sf0.1 ten times with
consistent key shifts — the scale-proof input for BENCH/CORRECTNESS at
10x the bench SF (driver-side tooling, like check.py; NOT library code).

Replication rules (replica k in 0..9, k=0 is the original):
- region/nation: fixed dimensions, copied once.
- customer/supplier/part/orders/lineitem/events: keys shifted by
  k * OFFSET consistently across tables, so join fan-ins scale like a
  real 10x corpus (same selectivities, 10x rows).
- documents: doc_id shifted; for k>0 every 3rd token gets a per-replica
  suffix — matching the dedup paths' shingleN=3 default, so EVERY
  3-token shingle covers a salted token and cross-replica Jaccard ~ 0,
  while within-replica (planted) near-dup structure is preserved.
  (A 5-token stride left 2 of 5 shingles identical across replicas:
  cross-replica candidate pairs survived pruning and inflated the sf1
  dedup workload ~K^2 — a data artifact, not a real workload.)
- embeddings: vec_id shifted; each replica k>0 is mapped through a
  deterministic random ROTATION R_k (orthogonal, from QR of a seeded
  Gaussian matrix). Rotations preserve every within-replica cosine
  exactly (planted twins stay twins, the near-dup workload scales 10x
  honestly) while decorrelating replicas. An additive shared-noise
  perturbation was tried first and rejected: a common component across
  a replica inflates ALL pairwise cosines and explodes LSH candidate
  counts ~100x — a data artifact, not a real workload.

Timestamps are left untouched: 10x events in the same time range is
how a 10x-traffic deployment actually looks (denser windows, not a
longer history). events keeps its INT64 TIMESTAMP(NANOS) physical type
(parquet 2.6), matching what graft.core.Tables.events expects.
"""
import hashlib
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# Far above any sf0.1 key AND clear of the planted-twin offset (+1e9) used
# by Dedup.withPlantedTwins: a 1e9 replica stride made replica k's twins
# collide with replica k+1's original vec_ids (duplicate ids in the union).
OFFSET = 10_000_000_000


def shift(col, k):
    return pc.add(col, pa.scalar(k * OFFSET, type=col.type))


def salt_text(text, k):
    if k == 0:
        return text
    toks = text.split(" ")
    return " ".join(
        t + f"_r{k}" if i % 3 == 0 else t for i, t in enumerate(toks))


def replica_rotation(k, dim):
    seed = int.from_bytes(hashlib.sha256(f"sf1-rot-{k}".encode()).digest()[:8],
                          "little") % (2**32)
    rng = np.random.default_rng(seed)
    q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
    return (q * np.sign(np.diag(r))).astype(np.float32)


def write(name, table):
    pq.write_table(table, f"{DST}/{name}.parquet", version="2.6",
                   coerce_timestamps=None, compression="snappy")
    print(f"{name}: {table.num_rows} rows")


def main():
    import os
    os.makedirs(DST, exist_ok=True)

    for name in ("region", "nation"):
        write(name, pq.read_table(f"{SRC}/{name}.parquet"))

    keyed = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    for name, keys in keyed.items():
        base = pq.read_table(f"{SRC}/{name}.parquet")
        parts = []
        for k in range(K):
            t = base
            for key in keys:
                t = t.set_column(t.schema.get_field_index(key), key,
                                 shift(t.column(key), k))
            parts.append(t)
        write(name, pa.concat_tables(parts))

    docs = pq.read_table(f"{SRC}/documents.parquet")
    texts = docs.column("text").to_pylist()
    parts = []
    for k in range(K):
        salted = [salt_text(t, k) for t in texts]
        t = docs.set_column(docs.schema.get_field_index("doc_id"), "doc_id",
                            shift(docs.column("doc_id"), k))
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(salted, type=pa.string()))
        t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                         pa.array([len(s) for s in salted], type=pa.int64()))
        parts.append(t)
    write("documents", pa.concat_tables(parts))

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    parts = []
    for k in range(K):
        noisy = vecs if k == 0 else vecs @ replica_rotation(k, dim).T
        t = emb.set_column(emb.schema.get_field_index("vec_id"), "vec_id",
                           shift(emb.column("vec_id"), k))
        t = t.set_column(
            t.schema.get_field_index("embedding"), "embedding",
            pa.array([row.tolist() for row in noisy],
                     type=emb.schema.field("embedding").type))
        parts.append(t)
    write("embeddings", pa.concat_tables(parts))


if __name__ == "__main__":
    main()
