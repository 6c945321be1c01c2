#!/usr/bin/env python3
"""1000x documents variant with SIGNAL-PRESERVING replication: the
token-prefix analog of make_sf100's key offsets, for the shingle-join
family.

make_sf100's exact replication is the all-collide adversarial regime:
every shingle's DF multiplies by the replication factor, crosses d02's
DF=200 bucket cap, and the capped-universe contract (correctly) reports
zero pairs — which proves the cap defense but exercises no pair join.
This variant prefixes every token of replica i>0 with `r{i}_`
(vectorized: text -> 'r{i}_' + replace(text, ' ', ' r{i}_')), so each
replica's shingle DOMAIN is disjoint from every other's — per-replica
DF stays exactly at the source's level, buckets stay under the cap, and
the d02/d07/d19 pair pipeline runs 10x the sf10 join volume WITH
signal. Replica 0 stays verbatim. Token counts are unchanged, so d18's
gram structure scales the same way.

doc_id offsets as in make_sf100 (owner max+1 per replica); every other
table symlinks the source.

Usage: python3 tools/make_sf100p.py [src_dir] [dst_dir]
Defaults: /tmp/graft_sf10 -> /tmp/graft_sf100p
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100p"
REPLICAS = 10

ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    os.makedirs(DST, exist_ok=True)
    for table in ALL_TABLES:
        dst = f"{DST}/{table}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        if table != "documents":
            os.symlink(f"{SRC}/{table}.parquet", dst)
            continue
        src = pq.read_table(f"{SRC}/{table}.parquet")
        card = pc.max(src.column("doc_id")).as_py() + 1
        id_field = src.schema.field("doc_id")
        text_idx = src.schema.get_field_index("text")
        id_idx = src.schema.get_field_index("doc_id")
        replicas = []
        for i in range(REPLICAS):
            t = src
            shifted = pc.add(t.column("doc_id"), pa.scalar(i * card, id_field.type))
            t = t.set_column(id_idx, id_field, shifted)
            if i > 0:
                pfx = f"r{i}_"
                text = pc.binary_join_element_wise(
                    pa.scalar(pfx),
                    pc.replace_substring(t.column("text").combine_chunks(),
                                         " ", f" {pfx}"),
                    pa.scalar(""))
                t = t.set_column(text_idx, src.schema.field("text"), text)
            replicas.append(t)
        out = pa.concat_tables(replicas)
        rg = max(2048, out.num_rows // 96)
        pq.write_table(out, dst, row_group_size=rg)
        n_groups = pq.ParquetFile(dst).num_row_groups
        print(f"{table}: {src.num_rows} -> {out.num_rows} rows, {n_groups} row groups")


if __name__ == "__main__":
    main()
