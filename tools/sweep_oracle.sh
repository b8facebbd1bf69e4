#!/bin/bash
# Resumable sf0.1 oracle sweep: one checker process per key, progress in
# /tmp/sweep01.log — rerun to continue where it left off.
SF=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/verify_sf01}
LOG=${3:-/tmp/sweep01.log}
touch "$LOG"
for k in $(python3 -c "import json;print(' '.join(sorted(json.load(open('$OUT/oracle_sql.json')))))"); do
  grep -q "^OK   $k\b\|^FAIL $k" "$LOG" && continue
  python3 tools/check_oracle.py "$SF" "$OUT" "$k" 2>/dev/null | grep -E "^OK|^FAIL" >> "$LOG"
done
echo "done: $(grep -c '^OK' "$LOG") OK, $(grep -c '^FAIL' "$LOG") FAIL"
