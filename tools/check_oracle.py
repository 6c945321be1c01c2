#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (my own test harness,
not part of the library): run Verify output vs DuckDB oracle at a given sf.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = os.path.join(out_dir, name)
    files = glob.glob(f"{spark_path}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
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
