#!/usr/bin/env python3
"""Dev-only harness mimic (NOT part of the shipped library — the library is
pure Scala/Spark). Replays the driver's correctness gate locally: reads the
parquet dumps that `graft.Verify` wrote, runs each oracle SQL from
oracle_sql.json in DuckDB over the same source tables, and diffs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))

con = duckdb.connect()
for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

fails = []
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not spark_files:
        fails.append((name, "no spark output"))
        print(f"FAIL {name}: no spark output"); continue
    got = pq.read_table(spark_files).to_pandas()
    want = con.execute(sql).df()
    status = []
    if sorted(got.columns) != sorted(want.columns):
        status.append(f"schema {sorted(got.columns)} vs {sorted(want.columns)}")
    elif len(got) != len(want):
        status.append(f"rows {len(got)} vs {len(want)}")
    else:
        cols = sorted(got.columns)
        g = got[cols].sort_values(cols, ignore_index=True)
        w = want[cols].sort_values(cols, ignore_index=True)
        for c in cols:
            gv, wv = g[c], w[c]
            if gv.dtype.kind == 'f' or wv.dtype.kind == 'f':
                gv, wv = gv.astype(float).round(6), wv.astype(float).round(6)
                eq = ((gv == wv) | (gv.isna() & wv.isna())).all()
            else:
                try:
                    eq = (gv.astype(str) == wv.astype(str)).all()
                except Exception as e:
                    eq = False
            if not eq:
                n_bad = int((~((gv == wv) | (pd.isna(gv) & pd.isna(wv)))).sum()) \
                    if gv.dtype.kind == 'f' else -1
                status.append(f"col {c} mismatch ({n_bad} rows)")
    if status:
        fails.append((name, "; ".join(status)))
        print(f"FAIL {name}: {'; '.join(status)}")
    else:
        print(f"OK   {name} ({len(got)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
