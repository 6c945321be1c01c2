#!/usr/bin/env python3
"""1000x rung corpus for the SAMPLING/MIXING family (r17 — VERDICT r16
#3): replicate documents another 10x from sf10 (500k -> 5M docs) with
the owner-max+1 doc_id offset scheme, symlink every other table, and
PLANT GROUP SKEW — the ingredient the uniform ladder never gives the
md5-threshold samplers:

  replicas 5..9: source = 'srchot'  (50% of the corpus in ONE group —
                 2.5M docs vs the natural ~12.5k per src0..src19)
  replica 9, doc_id % 101 == 0: source = 'srcrare' (a ~5k-doc
                 needle group, 0.1% of the corpus)
  replicas 5..9: lang = 'en' (the q26 temperature mix sees an
                 ~80%-en corpus — the exact regime alpha-flattening
                 exists for)

Replicas 0..4 keep their natural source/lang mixture, so every gate
sees BOTH regimes at once: q20/q21's budgeted groups (src0..src2) stay
natural-size while the hash samplers stream past the hot group
map-only; q25's greedy window and q37's per-group top-k must sort the
2.5M-row srchot partition in ONE task (the documented inherent cost of
exact per-group order — this rung proves it survives, not that it's
free); q26's weight table collapses 5M rows to 6 lang rows.

text/n_chars are EXACT copies per replica (the samplers hash doc_id,
not text, so replica rows draw INDEPENDENT keep decisions — the honest
test of threshold arithmetic at 10x the key density).

Usage: python3 tools/make_sf100s.py [src_dir] [dst_dir]
Defaults: /tmp/graft_sf10 -> /tmp/graft_sf100s
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf100s"
REPLICAS = 10
HOT_FROM = 5          # replicas 5..9 form the hot group
RARE_REPLICA = 9
RARE_MOD = 101        # doc_id % 101 == 0 within replica 9 -> srcrare

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
        src = pq.read_table(f"{SRC}/documents.parquet")
        card = pc.max(src.column("doc_id")).as_py() + 1
        replicas = []
        for i in range(REPLICAS):
            t = src
            base_ids = t.column("doc_id")
            shifted = pc.add(base_ids, pa.scalar(i * card, pa.int64()))
            t = t.set_column(t.schema.get_field_index("doc_id"),
                             t.schema.field("doc_id"), shifted)
            if i >= HOT_FROM:
                n = t.num_rows
                hot_src = pa.array(["srchot"] * n, pa.string())
                if i == RARE_REPLICA:
                    # the needle group rides the UNSHIFTED id so its
                    # density is exactly 1/RARE_MOD of the replica
                    rem = pc.subtract(
                        base_ids,
                        pc.multiply(
                            pc.divide(base_ids, pa.scalar(RARE_MOD, pa.int64())),
                            pa.scalar(RARE_MOD, pa.int64())))
                    is_rare = pc.equal(rem, pa.scalar(0, pa.int64()))
                    hot_src = pc.if_else(
                        is_rare, pa.array(["srcrare"] * n, pa.string()),
                        hot_src)
                t = t.set_column(t.schema.get_field_index("source"),
                                 t.schema.field("source"), hot_src)
                t = t.set_column(t.schema.get_field_index("lang"),
                                 t.schema.field("lang"),
                                 pa.array(["en"] * n, pa.string()))
            replicas.append(t)
        out = pa.concat_tables(replicas)
        pq.write_table(out, dst, row_group_size=131072)
        hist = out.group_by("source").aggregate([("doc_id", "count")]) \
                  .sort_by([("doc_id_count", "descending")])
        top = {hist.column("source")[k].as_py(): hist.column("doc_id_count")[k].as_py()
               for k in range(min(4, hist.num_rows))}
        lang_hist = out.group_by("lang").aggregate([("doc_id", "count")])
        langs = {lang_hist.column("lang")[k].as_py(): lang_hist.column("lang_count"
                 if "lang_count" in lang_hist.column_names else "doc_id_count")[k].as_py()
                 for k in range(lang_hist.num_rows)}
        print(f"documents: {out.num_rows} rows, {hist.num_rows} sources; "
              f"top groups {top}; langs {langs}")
    print(f"done -> {DST}")


if __name__ == "__main__":
    main()
