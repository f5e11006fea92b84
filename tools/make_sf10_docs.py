#!/usr/bin/env python3
"""Generate sf10-scale documents/embeddings ONLY (100x sf0.1) for the
round-9 targeted probe of the dedup/ANN family — the auto-scaling claims
(LSH bit growth, semantic auto-k) are proven to sf1 and extrapolate a
decade further; this measures them there. Reuses make_sf1's replication
rules (salted every-3rd token => cross-replica Jaccard ~ 0; orthogonal
per-replica rotations => within-replica cosines exact, replicas
decorrelated). Replicas are streamed out one row group at a time so the
builder never holds 100 copies in memory. Driver-side tooling, like
check.py — NOT library code."""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import make_sf1 as m1

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf10"
K = int(sys.argv[3]) if len(sys.argv) > 3 else 100


def main():
    os.makedirs(DST, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    texts = docs.column("text").to_pylist()
    with pq.ParquetWriter(f"{DST}/documents.parquet", docs.schema,
                          version="2.6", compression="snappy") as w:
        for k in range(K):
            salted = [m1.salt_text(t, k) for t in texts]
            t = docs.set_column(docs.schema.get_field_index("doc_id"),
                                "doc_id", m1.shift(docs.column("doc_id"), k))
            t = t.set_column(t.schema.get_field_index("text"), "text",
                             pa.array(salted, type=pa.string()))
            t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                             pa.array([len(s) for s in salted], type=pa.int64()))
            w.write_table(t)
    print(f"documents: {docs.num_rows * K} rows")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    with pq.ParquetWriter(f"{DST}/embeddings.parquet", emb.schema,
                          version="2.6", compression="snappy") as w:
        for k in range(K):
            noisy = vecs if k == 0 else vecs @ m1.replica_rotation(k, dim).T
            t = emb.set_column(emb.schema.get_field_index("vec_id"),
                               "vec_id", m1.shift(emb.column("vec_id"), k))
            t = t.set_column(
                t.schema.get_field_index("embedding"), "embedding",
                pa.array([row.tolist() for row in noisy],
                         type=emb.schema.field("embedding").type))
            w.write_table(t)
    print(f"embeddings: {emb.num_rows * K} rows")


if __name__ == "__main__":
    main()
