#!/usr/bin/env python3
"""Generate sf10-scale events/orders/lineitem (100x sf0.1) for the
round-11 second-decade probe of the heaviest NON-dedup families
(graph_pagerank, ts_resample, stream_windowed_agg; documents-side gates
reuse testdata_sf10 from make_sf10_docs). Reuses make_sf1's key-shift
replication (consistent shifts across orders/lineitem keep join fan-ins
honest; timestamps untouched so 100x events = 100x traffic density, not
a longer history). Replicas stream out one at a time so the builder
never holds 100 copies in memory. Driver-side tooling, like check.py —
NOT library code."""
import os
import shutil
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import make_sf1 as m1

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-scale-sf10"
DOCS = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/testdata_sf10"
K = int(sys.argv[4]) if len(sys.argv) > 4 else 100

KEYED = {
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}


def main():
    os.makedirs(DST, exist_ok=True)
    for name, keys in KEYED.items():
        base = pq.read_table(f"{SRC}/{name}.parquet")
        with pq.ParquetWriter(f"{DST}/{name}.parquet", base.schema,
                              version="2.6", compression="snappy") as w:
            for k in range(K):
                t = base
                for key in keys:
                    t = t.set_column(t.schema.get_field_index(key), key,
                                     m1.shift(t.column(key), k))
                w.write_table(t)
        print(f"{name}: {base.num_rows * K} rows")
    # small dimensions copied as-is (pagerank joins none, but Tables may
    # touch them for other gates sharing the dir)
    for name in ("region", "nation", "customer", "supplier", "part"):
        src = f"{SRC}/{name}.parquet"
        if os.path.exists(src):
            shutil.copyfile(src, f"{DST}/{name}.parquet")
    # documents/embeddings: reuse the make_sf10_docs output
    for name in ("documents", "embeddings"):
        src = f"{DOCS}/{name}.parquet"
        if os.path.exists(src):
            shutil.copyfile(src, f"{DST}/{name}.parquet")
            print(f"{name}: copied from {DOCS}")


if __name__ == "__main__":
    main()
