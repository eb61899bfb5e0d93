#!/usr/bin/env bash
# One-command closing evidence for a round (VERDICT r13 #8):
#   1. full scalatest suite
#   2. tri-scale graft.Verify dump (sf0.001 / sf0.01 / sf0.1)
#   3. DuckDB differential oracle over each dump (tools/check_oracle.py)
# Exit nonzero on the first red step. Artifacts land under
# /tmp/graft-closing-<ts>/ and a one-line PASS/FAIL summary per step is
# printed at the end for the round status block.
#
# Usage: tools/closing_check.sh [--skip-tests]
set -u
cd "$(dirname "$0")/.."

TS=$(date +%Y%m%d-%H%M%S)
OUT=/tmp/graft-closing-$TS
mkdir -p "$OUT"
declare -a SUMMARY
fail=0

step() { # name cmd...
  local name=$1; shift
  echo "=== $name ==="
  if "$@" >"$OUT/$name.log" 2>&1; then
    SUMMARY+=("PASS $name")
  else
    SUMMARY+=("FAIL $name (log: $OUT/$name.log)")
    fail=1
    tail -n 30 "$OUT/$name.log"
  fi
}

if [[ "${1:-}" != "--skip-tests" ]]; then
  step "sbt-test" sbt -batch test
fi

for sf in 0.001 0.01 0.1; do
  step "verify-sf$sf" sbt -batch "runMain graft.Verify /root/testdata/sf$sf $OUT/verify-sf$sf"
  step "oracle-sf$sf" python3 tools/check_oracle.py "/root/testdata/sf$sf" "$OUT/verify-sf$sf"
done

# ETL throughput regression (r20, VERDICT r19 #8): BASELINE.md's r19 row
# promises "re-run per round, warn < 0.5x any column" — enforce it here.
etl_check() {
  sbt -batch "runMain graft.EtlBench 50000" 2>&1 | tee "$OUT/etlbench.raw" \
    | grep '"metric"' > "$OUT/etlbench.json" || return 1
  python3 - "$OUT/etlbench.json" <<'PY'
import json, sys
r = json.load(open(sys.argv[1]))
# r19 pins (BASELINE.md throughput row); bar = 0.5x
pins = {"value": 5361.0, "parquet_rows_per_sec": 58621.0,
        "jdbc_rows_per_sec": 11403.0}
bad = [(k, r[k], p) for k, p in pins.items() if r[k] < 0.5 * p]
print(json.dumps({"etl": r, "regressions": bad}))
sys.exit(1 if bad else 0)
PY
}
step "etl-throughput" etl_check

echo
echo "=== closing summary ($OUT) ==="
for line in "${SUMMARY[@]}"; do echo "$line"; done
exit $fail
