#!/usr/bin/env bash
# Full local gate, exactly what the driver exercises plus the test suite:
#   tools/ci.sh [sfDir]           (default /root/testdata/sf0.01)
# Exits non-zero on any failure.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="$(mktemp -d /tmp/graft_ci.XXXXXX)"

echo "== 1/5 compile + tests"
sbt -batch test

echo "== 2/5 verify dump @ $SF"
sbt -batch "runMain graft.Verify $SF $OUT"

echo "== 3/5 DuckDB oracle compare"
python3 tools/check.py "$SF" "$OUT" | tail -5
python3 tools/check.py "$SF" "$OUT" | grep -q " 0 failing" \
  || { echo "ORACLE FAILURES"; exit 1; }

echo "== 4/5 oracle fragility audit (r7 cross-engine-round failure class)"
python3 tools/fragility.py "$SF" "$OUT" | tail -12 \
  || { echo "FRAGILE ORACLE ROUNDS"; exit 1; }

echo "== 5/5 bench (sf0.1)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  | grep -oE '\{"metric".*' | tee "$OUT/bench.json"

echo "CI GREEN — artifacts in $OUT"
