#!/usr/bin/env python3
"""Dev-only harness mimic (NOT part of the shipped library — the library is
pure Scala/Spark). Replays the driver's correctness gate locally: reads the
parquet dumps that `graft.Verify` wrote, runs each oracle SQL from
oracle_sql.json in DuckDB over the same source tables, and diffs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
# optional arg 3: comma-separated key subset (long sf0.1 sweeps run in
# resumable chunks; a typo'd name errors rather than silently shrinking)
if len(sys.argv) > 3:
    only = [k.strip() for k in sys.argv[3].split(",") if k.strip()]
    unknown = [k for k in only if k not in oracle]
    if unknown:
        sys.exit(f"unknown keys in subset: {unknown}")
    oracle = {k: oracle[k] for k in only}

con = duckdb.connect()
for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(t)[:-len(".parquet")]
    # driver fixtures are single files; Spark-built ones (the sf1 scale
    # fixture) are directories of part files — glob those for DuckDB
    src = os.path.join(t, "*.parquet") if os.path.isdir(t) else t
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")

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
                # Driver-faithful: the driver hashes RAW values, so any
                # bit-level divergence (-0.0 vs +0.0, rendering drift)
                # must fail HERE too. Compare IEEE bit patterns — the
                # r07 window_rolling_corr red (DuckDB round() emitting
                # -0.0) was invisible to the old round(6) + float ==
                # check for two straight rounds. NaN (any payload) vs
                # NaN is treated equal: pandas nulls arrive as NaN and
                # no query emits NaN by policy (empty frame -> NULL).
                ga = gv.astype('float64').to_numpy()
                wa = wv.astype('float64').to_numpy()
                bad = ~((ga.view('int64') == wa.view('int64'))
                        | (np.isnan(ga) & np.isnan(wa)))
                if bad.any():
                    i = int(np.argmax(bad))
                    status.append(
                        f"col {c} bit-mismatch ({int(bad.sum())} rows; "
                        f"first: {ga[i]!r} vs {wa[i]!r} at sorted row {i})")
            else:
                try:
                    eq = (gv.astype(str) == wv.astype(str)).all()
                except Exception as e:
                    eq = False
                if not eq:
                    status.append(f"col {c} mismatch")
    if status:
        fails.append((name, "; ".join(status)))
        print(f"FAIL {name}: {'; '.join(status)}")
    else:
        print(f"OK   {name} ({len(got)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
