#!/usr/bin/env bash
# One-command release certification (r19, VERDICT r18 #7): everything
# a reader needs to re-derive the round's claims, in dependency order.
# This is the handoff entry point — gate.sh is the per-round inner
# loop; release.sh is the full story at every scale the sandbox holds.
#
#   1. scripts/gate.sh          build + full test suite + scale certs
#                               + sf0.01 four-way oracle certification
#                               + sf0.1 paired bench (3 load-guarded
#                               legs, median committed)
#   2. sf1 data  (GenSf1)       regenerated if /tmp was wiped
#   3. sf1 certification        Verify + check_oracle, default AND
#                               forced-distributed regimes
#   4. sf1 paired anchor        warm best-of-3 both engines, same box
#   5. sf10 data (GenSf10)      all tables, 10x sf1
#   6. sf10 certification       Verify + check_oracle under the
#                               ORACLE_TIMEOUT_SEC budget (oracles the
#                               single-process engine cannot finish in
#                               budget are recorded as engine wins)
#   7. sf10 paired anchor       DUCK_TIMEOUT_SEC-budgeted
#   8. sf10 spot invariants     Sf10Spot growth/replica-independence
#
# Usage: RELEASE_ROUND=NN scripts/release.sh
# Wall cost: ~4-6 h on an idle 32-core box; the paired legs REFUSE a
# contended box (boxstate load guard; see BASELINE.md abort rule).
# Artifacts land as *_r${RELEASE_ROUND}.{txt,json} exactly as the
# per-round gate writes them.
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${RELEASE_ROUND:?set RELEASE_ROUND=NN (artifact stamp)}"
SF1=/tmp/graft_sf1
SF10=/tmp/graft_sf10

fail() { echo; echo "!!!!!!!! RELEASE RED: $1 !!!!!!!!"; exit 1; }

echo "== release 1/8: round gate (build, tests, sf0.01 four-way, sf0.1 paired) =="
GATE_ROUND="$ROUND" scripts/gate.sh || fail "gate"

echo "== release 2/8: sf1 data =="
sbt -batch "runMain graft.GenSf1" || fail "GenSf1"

echo "== release 3/8: sf1 certification (default + forced-distributed) =="
rm -rf /tmp/release_v_sf1
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $SF1 /tmp/release_v_sf1" \
  || fail "Verify sf1"
python3 scripts/check_oracle.py "$SF1" /tmp/release_v_sf1 \
  | tee "CORRECTNESS_SF1_r${ROUND}.txt" || fail "sf1 compare"
rm -rf /tmp/release_v_sf1d
SPARK_GRAFT_FORCE_DISTRIBUTED=1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Verify $SF1 /tmp/release_v_sf1d" \
  || fail "Verify sf1 (forced)"
python3 scripts/check_oracle.py "$SF1" /tmp/release_v_sf1d \
  | tee "CORRECTNESS_SF1_DISTRIBUTED_r${ROUND}.txt" \
  || fail "sf1 compare (forced)"

echo "== release 4/8: sf1 paired anchor =="
python3 scripts/boxstate.py 3 > /tmp/release_box_sf1.json
SPARK_GRAFT_SF_DIR="$SF1" SPARK_GRAFT_BENCH_JSON="BENCH_SF1_r${ROUND}.json" \
  sbt -batch "runMain graft.Bench" || fail "sf1 bench (spark)"
python3 scripts/bench_duckdb.py "$SF1" /tmp/release_v_sf1/oracle_sql.json \
  > "DUCK_SF1_r${ROUND}.json" || fail "sf1 bench (duckdb)"
python3 scripts/make_paired.py "BENCH_SF1_r${ROUND}.json" \
  "DUCK_SF1_r${ROUND}.json" "PAIRED_SF1_r${ROUND}.json" \
  /tmp/release_box_sf1.json || fail "sf1 paired merge"

echo "== release 5/8: sf10 data =="
sbt -batch "runMain graft.GenSf10" || fail "GenSf10"

echo "== release 6/8: sf10 certification (oracle budget ${ORACLE_TIMEOUT_SEC:-300}s) =="
rm -rf /tmp/release_v_sf10
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify $SF10 /tmp/release_v_sf10" \
  || fail "Verify sf10"
ORACLE_TIMEOUT_SEC="${ORACLE_TIMEOUT_SEC:-300}" \
  python3 scripts/check_oracle.py "$SF10" /tmp/release_v_sf10 \
  | tee "CORRECTNESS_SF10_r${ROUND}.txt" || fail "sf10 compare"

echo "== release 7/8: sf10 paired anchor (duck budget ${DUCK_TIMEOUT_SEC:-180}s) =="
python3 scripts/boxstate.py 3 > /tmp/release_box_sf10.json
SPARK_GRAFT_SF_DIR="$SF10" SPARK_GRAFT_BENCH_JSON="BENCH_SF10_r${ROUND}.json" \
  sbt -batch "runMain graft.Bench" || fail "sf10 bench (spark)"
DUCK_TIMEOUT_SEC="${DUCK_TIMEOUT_SEC:-180}" \
  python3 scripts/bench_duckdb.py "$SF10" /tmp/release_v_sf10/oracle_sql.json \
  > "DUCK_SF10_r${ROUND}.json" || fail "sf10 bench (duckdb)"
python3 scripts/make_paired.py "BENCH_SF10_r${ROUND}.json" \
  "DUCK_SF10_r${ROUND}.json" "PAIRED_SF10_r${ROUND}.json" \
  /tmp/release_box_sf10.json || fail "sf10 paired merge"

echo "== release 8/8: sf10 spot invariants =="
GRAFT_TOOL_MASTER='local[32]' \
  sbt -batch "runMain graft.Sf10Spot $SF1 $SF10" \
  | tee "SF10SPOT_r${ROUND}.txt" || fail "Sf10Spot"

echo
echo "======== RELEASE GREEN (round $ROUND) ========"
