#!/usr/bin/env python3
"""Deterministic 10x scale-up of the driver's sf0.1 testdata to sf1.

The driver generates sf{0.001,0.01,0.1}; the round-8 verdict asks for a
one-shot gate+bench artifact at sf1 (10x data) to prove the scale story
beyond plan-shape pins. This tool synthesizes sf1 from sf0.1 the same way
TPC-H scales: replicate each FACT/entity table 10x with key columns
offset by replica * cardinality (so every foreign key still resolves,
join fan-outs stay constant, and the data distribution per key is
unchanged), while the fixed dimensions region/nation keep their 25/5 rows
as at every TPC-H scale factor. Replica 0 is the original data verbatim.

pyarrow (not Spark/DuckDB) so every physical type survives byte-for-byte
-- in particular events.ts stays timestamp[ns], which GraftSession reads
as a nanosecond long via spark.sql.legacy.parquet.nanosAsLong.

Row groups: the driver's sf0.1 files carry ONE row group each, which
makes every scan stage a single Spark task (splits align to row
groups) -- a test-fixture artifact a real corpus doesn't have (100 TB
is thousands of files x several row groups). sf1 writes ~48 row groups
per large table so scan-stage parallelism at sf1 reflects a real
multi-split layout.

Usage: python3 tools/make_sf1.py [src_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /tmp/graft_sf1
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
REPLICAS = 10

# table -> {key column -> per-replica offset (its sf0.1 cardinality)}
OFFSETS = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 1500},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
}


def main():
    import os

    os.makedirs(DST, exist_ok=True)
    for table, key_offsets in OFFSETS.items():
        src = pq.read_table(f"{SRC}/{table}.parquet")
        if not key_offsets:  # fixed dimension: copy verbatim
            pq.write_table(src, f"{DST}/{table}.parquet")
            print(f"{table}: {src.num_rows} rows (fixed dimension, copied)")
            continue
        replicas = []
        for i in range(REPLICAS):
            t = src
            for col, step in key_offsets.items():
                idx = t.schema.get_field_index(col)
                shifted = pc.add(t.column(col), pa.scalar(i * step, t.schema.field(col).type))
                t = t.set_column(idx, t.schema.field(col), shifted)
            replicas.append(t)
        out = pa.concat_tables(replicas)
        rg = max(2048, out.num_rows // 48)
        pq.write_table(out, f"{DST}/{table}.parquet", row_group_size=rg)
        n_groups = pq.ParquetFile(f"{DST}/{table}.parquet").num_row_groups
        print(f"{table}: {src.num_rows} -> {out.num_rows} rows, {n_groups} row groups")


if __name__ == "__main__":
    main()
