#!/usr/bin/env python3
"""Engine-side invariants for the shingle-join dedup family at 1000x
(5M docs), for where the DuckDB oracle itself cannot scale (its
corpus-wide shingle self-join spills past temp disk at this size —
the r13/sf1 CTE lesson, one decade further up).

The sf100 corpus is sf10 replicated 10x with doc_id offsets (replica 0
= sf10 verbatim, replicas 1-9 = exact text copies at higher ids), which
makes three invariants EXACT, not statistical:

d18 (keep-first substring dedup; first occurrence = lowest (doc_id, pos)):
  I1. replica-0 projection: rows with doc_id < card must equal the sf10
      run row-for-row (adding higher-id duplicates cannot steal a
      keep-first win from a lower id).
  I2. replica 1-9 docs are fully covered: every gram they contain
      already occurs in replica 0 at a lower doc_id, so any doc with
      n_tokens >= 8 must come back with n_removed == n_tokens and
      text_dedup == '' (docs under the 8-token gram floor pass through
      untouched: n_removed == 0, text_dedup == trimmed original).
  I3. per-row conservation over ALL 5M rows:
      tokens(text_dedup) + n_removed == n_tokens.

d19 (near-dup corpus emitter over d02 pairs):
  I4. conservation: sum(cluster_size) == |corpus| == 5M — every input
      doc accounted for in exactly one survivor's cluster.
  I5. survivors are unique doc_ids; emitted text == the original text.
  I6. drop count == the d02 pair graph's (members - components): the
      emitter must drop exactly one doc per clustered doc beyond each
      cluster's survivor. Regime-aware by construction: in the
      all-collide EXACT-replica regime d02 correctly serves ZERO pairs
      (every shingle's DF >= 1000 > the 200 cap — the capped-universe
      contract; the cap is what stops a 100 TB run from quadratic pair
      blowup on boilerplate), so the expected drop is 0; in the
      signal-preserving sf100p regime the pair graph is non-trivial and
      the full DuckDB oracle pins the output row-for-row anyway.

For the sf100p (token-prefixed, signal-preserving) variant, I2's
premise does not hold — replicas are near-dup-structured, not exact
copies — so `--variant prefixed` replaces I2 with its analog: each
replica's d18 output, prefixes stripped and ids de-offset, must equal
the sf10 output row-for-row (the per-replica projection; the full
DuckDB oracle additionally pins the whole output when it survives).

Usage: python3 tools/check_dedup_sf100.py <sf100_dir> <verify_sf100_out> <verify_sf10_out> [--variant exact|prefixed]
"""
import sys

import duckdb

sf100, out100, out10 = sys.argv[1], sys.argv[2], sys.argv[3]
variant = "prefixed" if "--variant" in sys.argv and \
    sys.argv[sys.argv.index("--variant") + 1] == "prefixed" else "exact"
con = duckdb.connect()
fails = []


def check(name, sql, expect_zero=True):
    n = con.execute(sql).fetchone()[0]
    ok = (n == 0) if expect_zero else (n != 0)
    print(f"{'OK  ' if ok else 'FAIL'} {name}: {n}")
    if not ok:
        fails.append(name)


card = con.execute(
    f"SELECT max(doc_id) + 1 FROM '{out10}/d18_substring_dedup/*.parquet'"
).fetchone()[0]
print(f"# replica cardinality (sf10 max doc_id + 1): {card}")

# I1: replica-0 projection of d18 == the sf10 run, row-for-row
check("d18 I1 replica-0 rows == sf10 rows (full anti-join both ways)", f"""
  WITH a AS (SELECT * FROM '{out100}/d18_substring_dedup/*.parquet'
             WHERE doc_id < {card}),
       b AS (SELECT * FROM '{out10}/d18_substring_dedup/*.parquet')
  SELECT (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
       + (SELECT count(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a))
""")

if variant == "exact":
    # I2: replica 1-9 docs with >= 8 tokens are FULLY removed (every
    # gram already occurs in replica 0 at a lower id); short docs untouched
    check("d18 I2 replica 1-9 full-coverage violations", f"""
      SELECT count(*) FROM '{out100}/d18_substring_dedup/*.parquet'
      WHERE doc_id >= {card}
        AND NOT (
          (n_tokens >= 8 AND n_removed = n_tokens AND text_dedup = '')
          OR (n_tokens < 8 AND n_removed = 0)
        )
    """)
else:
    # I2': per-replica projection — replica i's rows, ids de-offset and
    # 'r{i}_' prefixes stripped, equal the sf10 run row-for-row (the
    # prefixed shingle domains are disjoint, so each replica
    # deduplicates in isolation exactly like sf10)
    for i in range(1, 10):
        check(f"d18 I2' replica {i} projection != sf10 rows", f"""
          WITH a AS (
            SELECT doc_id - {i * card} AS doc_id,
              replace(text_dedup, 'r{i}_', '') AS text_dedup,
              n_tokens, n_removed
            FROM '{out100}/d18_substring_dedup/*.parquet'
            WHERE doc_id >= {i * card} AND doc_id < {(i + 1) * card}),
          b AS (SELECT * FROM '{out10}/d18_substring_dedup/*.parquet')
          SELECT (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
               + (SELECT count(*) FROM (SELECT * FROM b EXCEPT SELECT * FROM a))
        """)

# I3: per-row token conservation over all 5M rows
check("d18 I3 token-conservation violations (5M rows)", f"""
  SELECT count(*) FROM '{out100}/d18_substring_dedup/*.parquet'
  WHERE (CASE WHEN text_dedup = '' THEN 0
              ELSE len(string_split_regex(text_dedup, '\\s+')) END)
        + n_removed != n_tokens
""")

# I4: d19 conservation — sum(cluster_size) == |corpus|
ncorpus = con.execute(
    f"SELECT count(*) FROM '{sf100}/documents.parquet'").fetchone()[0]
total = con.execute(
    f"SELECT sum(cluster_size) FROM '{out100}/d19_neardup_corpus/*.parquet'"
).fetchone()[0]
ok = total == ncorpus
print(f"{'OK  ' if ok else 'FAIL'} d19 I4 sum(cluster_size) == |corpus|: {total} vs {ncorpus}")
if not ok:
    fails.append("d19 I4")

# I5: survivors unique; emitted text == original text
check("d19 I5 duplicate survivor ids", f"""
  SELECT count(*) - count(DISTINCT doc_id)
  FROM '{out100}/d19_neardup_corpus/*.parquet'
""")
check("d19 I5 emitted text != original", f"""
  SELECT count(*)
  FROM '{out100}/d19_neardup_corpus/*.parquet' o
  JOIN '{sf100}/documents.parquet' d USING (doc_id)
  WHERE o.text != d.text
""")

# I6: drop count == pair graph's (members - components), both regimes
nsurv = con.execute(
    f"SELECT count(*) FROM '{out100}/d19_neardup_corpus/*.parquet'").fetchone()[0]
ndropped = ncorpus - nsurv
pairs = con.execute(
    f"SELECT d1, d2 FROM '{out100}/d02_dedup_ngram_jaccard/*.parquet'"
).fetchall()
parent = {}


def find(x):
    parent.setdefault(x, x)
    while parent[x] != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x


for a, b in pairs:
    parent[find(a)] = find(b)
members = len(parent)
comps = len({find(x) for x in parent})
expected_drop = members - comps
ok = ndropped == expected_drop
print(f"{'OK  ' if ok else 'FAIL'} d19 I6 drop == pair-graph members-components: "
      f"{ndropped} dropped vs expected {expected_drop} "
      f"({len(pairs)} pairs, {members} members, {comps} components)")
if not ok:
    fails.append("d19 I6")

if fails:
    print(f"FAILED: {fails}")
    sys.exit(1)
print("all invariants hold")
