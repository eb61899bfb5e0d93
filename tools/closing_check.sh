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

echo
echo "=== closing summary ($OUT) ==="
for line in "${SUMMARY[@]}"; do echo "$line"; done
exit $fail
