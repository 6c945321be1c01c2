#!/usr/bin/env python3
"""Deterministic 10x scale-up of an ALREADY-SCALED dir (sf1 -> sf10).

Same replication scheme as make_sf1.py (replicate with key offsets so
every FK resolves; fixed dims verbatim), but the per-key offsets are
DERIVED from the source tables (owning table's max key + 1) instead of
hardcoded sf0.1 cardinalities — so the tool composes: sf0.1 -> sf1 ->
sf10 gives 100x the driver's bench scale for spot-checking that the
1.8x-per-10x wall-clock story keeps holding another decade up.

Usage: python3 tools/make_sf10.py [src_dir] [dst_dir]
Defaults: /tmp/graft_sf1 -> /tmp/graft_sf10
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf10"
REPLICAS = 10

# key entity -> (owning table, owning column); every table shifting a
# key uses the OWNER's cardinality so cross-table FKs stay aligned
OWNERS = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}

TABLE_KEYS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def main():
    os.makedirs(DST, exist_ok=True)
    card = {}
    for entity, (table, colname) in OWNERS.items():
        col = pq.read_table(f"{SRC}/{table}.parquet", columns=[colname]).column(0)
        card[entity] = pc.max(col).as_py() + 1
    for table, key_entities in TABLE_KEYS.items():
        src = pq.read_table(f"{SRC}/{table}.parquet")
        if not key_entities:
            pq.write_table(src, f"{DST}/{table}.parquet")
            print(f"{table}: {src.num_rows} rows (fixed dimension, copied)")
            continue
        replicas = []
        for i in range(REPLICAS):
            t = src
            for colname, entity in key_entities.items():
                idx = t.schema.get_field_index(colname)
                shifted = pc.add(t.column(colname),
                                 pa.scalar(i * card[entity], t.schema.field(colname).type))
                t = t.set_column(idx, t.schema.field(colname), shifted)
            replicas.append(t)
        out = pa.concat_tables(replicas)
        rg = max(2048, out.num_rows // 96)
        pq.write_table(out, f"{DST}/{table}.parquet", row_group_size=rg)
        n_groups = pq.ParquetFile(f"{DST}/{table}.parquet").num_row_groups
        print(f"{table}: {src.num_rows} -> {out.num_rows} rows, {n_groups} row groups")


if __name__ == "__main__":
    main()
