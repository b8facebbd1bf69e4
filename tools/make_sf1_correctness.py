#!/usr/bin/env python3
"""Assemble SF1CORRECTNESS.json from a completed sf1 sweep log
(tools/sweep_oracle.sh output) + the Verify dump's row counts.

Usage: python3 tools/make_sf1_correctness.py <sweepLog> <verifyOutDir> [out]
"""
import sys, json, re, glob, os
import pyarrow.parquet as pq

log, out_dir = sys.argv[1], sys.argv[2]
dst = sys.argv[3] if len(sys.argv) > 3 else "SF1CORRECTNESS.json"

keys = {}
for line in open(log):
    m = re.match(r"^(OK|FAIL)\s+(\S+)", line.strip())
    if not m:
        continue
    ok, name = m.group(1) == "OK", m.group(2)
    rows = None
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if files:
        rows = sum(pq.read_metadata(f).num_rows for f in files)
    keys[name] = {"match": ok, "rows": rows}

doc = {
    "metric": "sf1_correctness",
    "fixture": "/tmp/graft_sf1 (graft.Sf1Build: 10x key-shifted sf0.1 — "
               "TPC-H scaling model, see Sf1Probe scaladoc)",
    "sf": 1.0,
    "gate": "tools/check_oracle.py (driver-faithful: schema + rows + "
            "IEEE-bit value compare) vs DuckDB on the same parquet",
    "selection": "round-11 expansion: every non-streaming key except the "
                 "declared brute-force ANN baselines and heavyweight "
                 "mm staging keys — all window/agg/join/asof/ts/text/"
                 "dedup/sample/curation families, re-dumped FRESH so "
                 "every hash reflects shipped code (incl. the "
                 "rolling-median lag-array rewrite and the ppjoin "
                 "graph sibling)",
    "keys": dict(sorted(keys.items())),
    "n_ok": sum(1 for v in keys.values() if v["match"]),
    "n_total": len(keys),
}
json.dump(doc, open(dst, "w"), indent=1)
print(f"{doc['n_ok']}/{doc['n_total']} -> {dst}")
