#!/usr/bin/env bash
# Round gate (driver-side tooling; NOT part of the Scala engine).
#
# Runs, in order, refusing (nonzero exit + loud banner) on any red:
#   1. sbt compile + Test/compile + test   (the full ScalaTest suite)
#   2. graft.Verify at sf0.01              (dump every query to parquet)
#   3. scripts/check_oracle.py             (DuckDB value-level compare)
#   4. graft.Bench smoke at sf0.01         (rc=0 and n_failed=0)
#
# Usage: scripts/gate.sh [sfDir]          default /root/testdata/sf0.01
# Fast variant while iterating: GATE_SKIP_BENCH=1 scripts/gate.sh
#
# Exists because rounds 5 and 8 both shipped non-compiling HEADs and
# scored zero; the end-of-round habit is: run this, see GATE GREEN,
# then (and only then) snapshot.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.01}"
OUT="${GATE_OUT:-/tmp/gate_verify}"

fail() { echo; echo "!!!!!!!! GATE RED: $1 !!!!!!!!"; exit 1; }

echo "== gate 1/4: sbt compile + Test/compile + test =="
sbt -batch compile Test/compile test || fail "sbt build/test"

echo "== gate 2/4: graft.Verify @ $SF -> $OUT =="
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF $OUT" || fail "graft.Verify"

echo "== gate 3/4: DuckDB oracle compare =="
python3 scripts/check_oracle.py "$SF" "$OUT" || fail "oracle compare"

if [[ "${GATE_SKIP_BENCH:-0}" != "1" ]]; then
  echo "== gate 4/4: bench smoke @ $SF =="
  BOUT=/tmp/gate_bench.out
  SPARK_GRAFT_SF_DIR="$SF" sbt -batch "runMain graft.Bench" | tee "$BOUT" \
    || fail "bench rc"
  grep -o '{"metric":.*}' "$BOUT" | tail -1 > /tmp/gate_bench.json \
    || fail "bench printed no JSON line"
  python3 - <<'EOF' || fail "bench n_failed"
import json
j = json.load(open("/tmp/gate_bench.json"))
assert j.get("n_failed", 1) == 0, f"bench failures: {j.get('errors')}"
print(f"bench ok: {j['value']} {j['unit']} over {len(j['queries'])} queries")
EOF
else
  echo "== gate 4/4: bench smoke SKIPPED (GATE_SKIP_BENCH=1) =="
fi

echo
echo "======== GATE GREEN ========"
