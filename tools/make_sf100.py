#!/usr/bin/env python3
"""Deterministic 1000x spot-check dir: replicate NAMED axes of sf10
another 10x (make_sf10.py's offset scheme applied once more), symlink
every other table verbatim.

The full 1000x cross-product (600M lineitem etc.) is neither needed nor
honest for a spot-check — each round targets the FAMILY under proof on
its own axis: r13 ran events (100M rows) + documents (5M) for the
state/drift/stat + documents families; r14 runs documents for the
shingle-join dedup family (d18/d19), the heaviest join shapes in the
repo. Keys shift by the owning table's max+1 per replica so the
distinct-domain structure keeps scaling with the data (not 10 copies of
one domain).

Usage: python3 tools/make_sf100.py [src_dir] [dst_dir] [table ...]
Defaults: /tmp/graft_sf10 -> /tmp/graft_sf100, tables: events documents
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100"
TABLES = sys.argv[3:] if len(sys.argv) > 3 else ["events", "documents"]
REPLICAS = 10

ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]

# key column -> owning (table, column); offsets derive from the OWNER's
# cardinality so the scheme composes up the ladder (same as make_sf10)
TABLE_KEYS = {
    "events": {"event_id": ("events", "event_id"),
               "user_id": ("events", "user_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}


def main():
    os.makedirs(DST, exist_ok=True)
    for table in ALL_TABLES:
        dst = f"{DST}/{table}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        if table not in TABLES:
            os.symlink(f"{SRC}/{table}.parquet", dst)
            continue
        keys = TABLE_KEYS[table]
        card = {}
        for colname, (otable, ocol) in keys.items():
            col = pq.read_table(f"{SRC}/{otable}.parquet", columns=[ocol]).column(0)
            card[colname] = pc.max(col).as_py() + 1
        src = pq.read_table(f"{SRC}/{table}.parquet")
        replicas = []
        for i in range(REPLICAS):
            t = src
            for colname in keys:
                idx = t.schema.get_field_index(colname)
                shifted = pc.add(t.column(colname),
                                 pa.scalar(i * card[colname],
                                           t.schema.field(colname).type))
                t = t.set_column(idx, t.schema.field(colname), shifted)
            replicas.append(t)
        out = pa.concat_tables(replicas)
        rg = max(2048, out.num_rows // 96)
        pq.write_table(out, dst, row_group_size=rg)
        n_groups = pq.ParquetFile(dst).num_row_groups
        print(f"{table}: {src.num_rows} -> {out.num_rows} rows, {n_groups} row groups")


if __name__ == "__main__":
    main()
