#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (my own test harness,
not part of the library): run Verify output vs DuckDB oracle at a given sf.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Results up to BIG_ROWS compare in pandas exactly like the driver
(columns sorted by name, full value equality). Larger results (q42
melts 240M rows at sf10) switch to a DuckDB-side multiset compare:
same sorted-column canon, numeric columns cast to DOUBLE on BOTH sides
(mirroring pandas' cross-dtype numeric equality), non-numerics to
VARCHAR (both sides formatted by the same engine), then EXCEPT ALL in
both directions — exact multiset equality without materializing either
side in Python memory.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
BIG_ROWS = 5_000_000

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

NUMERIC = ("TINYINT","SMALLINT","INTEGER","BIGINT","HUGEINT","UTINYINT",
           "USMALLINT","UINTEGER","UBIGINT","FLOAT","DOUBLE","DECIMAL")

def big_compare(name, spark_glob, sql, n_spark):
    """DuckDB-side exact multiset compare for results too big for pandas."""
    con.execute(f"CREATE OR REPLACE VIEW __spark AS SELECT * FROM read_parquet('{spark_glob}')")
    con.execute(f"CREATE OR REPLACE VIEW __oracle AS ({sql})")
    stypes = {r[0]: r[1] for r in con.execute("DESCRIBE __spark").fetchall()}
    otypes = {r[0]: r[1] for r in con.execute("DESCRIBE __oracle").fetchall()}
    if sorted(stypes) != sorted(otypes):
        print(f"FAIL {name}: columns spark={sorted(stypes)} duck={sorted(otypes)}")
        return False
    n_duck = con.execute("SELECT count(*) FROM __oracle").fetchone()[0]
    if n_spark != n_duck:
        print(f"FAIL {name}: rows spark={n_spark} duck={n_duck}")
        return False
    def casted(types):
        cols = []
        for c in sorted(types):
            num = any(types[c].upper().startswith(p) for p in NUMERIC) and \
                  any(otypes[c].upper().startswith(p) for p in NUMERIC) and \
                  any(stypes[c].upper().startswith(p) for p in NUMERIC)
            cols.append(f'CAST("{c}" AS {"DOUBLE" if num else "VARCHAR"}) AS "{c}"')
        return ", ".join(cols)
    s_sel = f"SELECT {casted(stypes)} FROM __spark"
    o_sel = f"SELECT {casted(otypes)} FROM __oracle"
    d1 = con.execute(f"SELECT count(*) FROM (({s_sel}) EXCEPT ALL ({o_sel}))").fetchone()[0]
    d2 = con.execute(f"SELECT count(*) FROM (({o_sel}) EXCEPT ALL ({s_sel}))").fetchone()[0]
    if d1 or d2:
        print(f"FAIL {name}: multiset diff spark-only={d1} duck-only={d2}")
        return False
    print(f"OK   {name}: {n_spark} rows (duckdb multiset)")
    return True

fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    files = glob.glob(f"{spark_path}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    n_spark = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    if n_spark > BIG_ROWS:
        try:
            if not big_compare(name, f"{spark_path}/*.parquet", sql, n_spark):
                fails += 1
        except Exception as e:
            print(f"FAIL {name}: big compare error: {e}"); fails += 1
        continue
    sdf = pq.read_table(files[0]).to_pandas()
    try:
        ddf = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue
    a, b = canon(sdf), canon(ddf)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}"); fails += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}"); fails += 1; continue
    # value compare: exact (driver hashes values)
    mismatch = None
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            eq = (av.isna() & bv.isna()) | (av == bv)
        except Exception:
            eq = av.astype(str) == bv.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = (c, i, av.iloc[i], bv.iloc[i], av.dtype, bv.dtype)
            break
    if mismatch:
        c, i, x, y, dx, dy = mismatch
        print(f"FAIL {name}: col {c} row {i}: spark={x!r}({dx}) duck={y!r}({dy})"); fails += 1
    else:
        print(f"OK   {name}: {len(a)} rows")

sys.exit(1 if fails else 0)
