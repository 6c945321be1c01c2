#!/usr/bin/env python3
"""1000x rung corpus for the JOIN/VINTAGE family (r16 — VERDICT r15
#6): replicate events, orders, and customer another 10x from sf10
(events 10M -> 100M, orders 15M -> 150M, customer 1.5M -> 15M) with the
make_sf10 owner-max+1 key-offset scheme, symlink every other table, and
PLANT SKEW in events — the ingredient the uniform ladder never tests:

  replica 9 rows with event_id % 10 == 0 keep their shifted event_id
  but get user_id = HOT_USER (42, a replica-0 key that keeps its
  customer match) — 1,000,000 events (1% of the corpus) on ONE key.

That hot key is exactly what q29's salting exists for (unsalted, one
reducer would take 1M rows; salt=8 splits it), what q16's per-user
window must sort without dying (one 1M-row partition), and what made
the r5-r15 naive q17 oracle quadratic (the swap to the sort-based
ASOF-difference oracle rode this rung).

Because user_id offsets derive from events.user_id cardinality (150k
at sf10) while customer keys span 1.5M, every replica's user_id range
still lands inside customer replica 0's key range — q29 keeps its
100% match rate by construction, so the join OUTPUT scales with
events, the honest volume for a skew probe.

Usage: python3 tools/make_sf100j.py [src_dir] [dst_dir]
Defaults: /tmp/graft_sf10 -> /tmp/graft_sf100j
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100j"
REPLICAS = 10
HOT_USER = 42
SKEW_REPLICA = 9
SKEW_MOD = 10  # 1/10 of one replica -> 1% of the corpus on HOT_USER

ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]

OWNERS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}

TABLE_KEYS = {
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
}


def main():
    os.makedirs(DST, exist_ok=True)
    card = {}
    for entity, (table, colname) in OWNERS.items():
        col = pq.read_table(f"{SRC}/{table}.parquet", columns=[colname]).column(0)
        card[entity] = pc.max(col).as_py() + 1
    for table in ALL_TABLES:
        dst = f"{DST}/{table}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        if table not in TABLE_KEYS:
            os.symlink(f"{SRC}/{table}.parquet", dst)
            continue
        src = pq.read_table(f"{SRC}/{table}.parquet")
        replicas = []
        for i in range(REPLICAS):
            t = src
            for colname, entity in TABLE_KEYS[table].items():
                idx = t.schema.get_field_index(colname)
                field = t.schema.field(colname)
                shifted = pc.add(t.column(colname), pa.scalar(i * card[entity], field.type))
                if table == "events" and colname == "user_id" and i == SKEW_REPLICA:
                    # plant the hot key: the SHIFTED ids stay unique,
                    # the user collapses deterministically
                    # (event_id here is already shifted by 9 * 10M,
                    # which is ~0 mod SKEW_MOD, so the mask equals the
                    # unshifted one; no pc.modulo in this pyarrow —
                    # subtract out the floor-div multiple instead)
                    ev = t.column("event_id")
                    mod = pc.subtract(
                        ev, pc.multiply(
                            pc.floor(pc.divide(pc.cast(ev, pa.float64()),
                                               SKEW_MOD)).cast(pa.int64()),
                            pa.scalar(SKEW_MOD, pa.int64())))
                    hot = pc.equal(mod, pa.scalar(0, pa.int64()))
                    shifted = pc.if_else(hot, pa.scalar(HOT_USER, field.type), shifted)
                t = t.set_column(idx, field, shifted)
            replicas.append(t)
        out = pa.concat_tables(replicas)
        rg = max(2048, out.num_rows // 96)
        pq.write_table(out, dst, row_group_size=rg)
        n_groups = pq.ParquetFile(dst).num_row_groups
        print(f"{table}: {src.num_rows} -> {out.num_rows} rows, {n_groups} row groups")
    hot = pq.read_table(f"{DST}/events.parquet", columns=["user_id"])
    n_hot = pc.sum(pc.cast(pc.equal(hot.column(0), pa.scalar(HOT_USER)),
                           pa.int64())).as_py()
    print(f"planted skew: user_id={HOT_USER} holds {n_hot} events")


if __name__ == "__main__":
    main()
