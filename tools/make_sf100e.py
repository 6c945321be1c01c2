#!/usr/bin/env python3
"""1000x embeddings corpus for the ANN family: sf10's 200k vectors
replicated 25x -> 5,000,000, vec_id offsets per replica (the make_sf100
owner-max+1 scheme), every other table symlinked.

Two regimes, mirroring the r14 dedup replication lesson (replication
policy IS the test):

  exact      replica vectors byte-identical to the source — every
             vector gains 24 exact twins at cosine 1.0. The all-collide
             analog: an IVF index must find a query's own copies from
             its nearest cell alone, and exact top-k is dominated by
             ties (rank order = the deterministic n_id tie-break).

  perturbed  replica i>0 adds deterministic per-(replica, vec_id, dim)
             jitter, uniform in [-0.01, 0.01] per float32 component
             (numpy PCG64 seeded with the replica index) — twins land
             at cosine ~0.9989 +- 0.0003 of their source: DISTINCT
             near-duplicates, so the corpus has genuine
             near-neighbor signal at 25x sf10 density with no ties —
             the regime where recall numbers mean something. Source
             replica 0 stays verbatim.

Labels and every other column are copied. Jitter is applied in float32
and written as float32, so both engines read identical bits and the
exact oracles (s01/s07/s12/s13 over the gate queries) stay exact.

Usage: python3 tools/make_sf100e.py [src_dir] [dst_dir] [--variant exact|perturbed]
Defaults: /tmp/graft_sf10 -> /tmp/graft_sf100e, exact
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

args = [a for a in sys.argv[1:] if not a.startswith("--")]
SRC = args[0] if len(args) > 0 else "/tmp/graft_sf10"
DST = args[1] if len(args) > 1 else "/tmp/graft_sf100e"
VARIANT = "exact"
for i, a in enumerate(sys.argv):
    if a == "--variant":
        VARIANT = sys.argv[i + 1]
assert VARIANT in ("exact", "perturbed"), VARIANT
REPLICAS = 25

ALL_TABLES = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    os.makedirs(DST, exist_ok=True)
    for table in ALL_TABLES:
        dst = f"{DST}/{table}.parquet"
        if os.path.lexists(dst):
            os.remove(dst)
        if table != "embeddings":
            os.symlink(f"{SRC}/{table}.parquet", dst)
            continue
        src = pq.read_table(f"{SRC}/{table}.parquet")
        card = pc.max(src.column("vec_id")).as_py() + 1
        id_field = src.schema.field("vec_id")
        id_idx = src.schema.get_field_index("vec_id")
        emb_idx = src.schema.get_field_index("embedding")
        emb_field = src.schema.field("embedding")
        n = src.num_rows
        # fixed-shape float32 matrix of the source embeddings
        flat = np.asarray(src.column("embedding").combine_chunks().flatten(),
                          dtype=np.float32)
        # the reshape below silently assumes a rectangular, null-free
        # embedding column; a ragged or null row would shift every
        # perturbed vector after it with no error — fail loudly instead
        assert src.column("embedding").null_count == 0, "null embedding rows"
        dim = flat.size // n
        assert flat.size == n * dim and dim > 0, \
            f"ragged embedding column: {flat.size} floats over {n} rows"
        mat = flat.reshape(n, dim)
        replicas = []
        for i in range(REPLICAS):
            t = src
            shifted = pc.add(t.column("vec_id"),
                             pa.scalar(i * card, id_field.type))
            t = t.set_column(id_idx, id_field, shifted)
            if VARIANT == "perturbed" and i > 0:
                rng = np.random.Generator(np.random.PCG64(i))
                jit = rng.uniform(-0.01, 0.01, size=mat.shape).astype(np.float32)
                pm = (mat + jit).astype(np.float32)
                col = pa.FixedSizeListArray.from_arrays(
                    pa.array(pm.reshape(-1), type=pa.float32()), dim).cast(
                    emb_field.type)
                t = t.set_column(emb_idx, emb_field, col)
            replicas.append(t)
        out = pa.concat_tables(replicas)
        rg = max(2048, out.num_rows // 96)
        pq.write_table(out, dst, row_group_size=rg)
        n_groups = pq.ParquetFile(dst).num_row_groups
        print(f"{table} ({VARIANT}): {n} -> {out.num_rows} rows, dim {dim}, "
              f"{n_groups} row groups")


if __name__ == "__main__":
    main()
