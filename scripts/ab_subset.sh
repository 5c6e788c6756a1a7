#!/usr/bin/env bash
# Optimization dev loop (r21, driver-side tooling; NOT part of the
# engine): bench a comma-separated query subset best-of-3 at sf0.1
# under the exact bench config, then value-check the same subset
# against the DuckDB oracle at sf0.01. Usage:
#
#   scripts/ab_subset.sh q03_revenue_by_nation,q06_outer_join [tag]
#
# Prints the per-query best-of-3 seconds and the oracle verdict; the
# full JSON lands in /tmp/ab_<tag>.json. Compare against the committed
# BENCH_FULL_r21_before.json numbers by eye (same box, same knobs).
set -euo pipefail
cd "$(dirname "$0")/.."
QS="$1"
TAG="${2:-dev}"

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_ONLY="$QS" \
  SPARK_GRAFT_BENCH_JSON="/tmp/ab_${TAG}.json" \
  sbt -batch "runMain graft.Bench" 2>&1 | tail -2

python3 - "$QS" "$TAG" <<'EOF'
import json, os, sys
qs, tag = sys.argv[1].split(','), sys.argv[2]
cur = json.load(open(f'/tmp/ab_{tag}.json'))
base = json.load(open(os.environ.get('AB_BASELINE', 'BENCH_FULL_r22_before.json')))
for q in qs:
    b, c = base['queries'].get(q), cur['queries'].get(q)
    if c is None: print(f'{q}: MISSING'); continue
    d = f'{(c/b-1)*100:+.0f}%' if b else 'n/a'
    print(f'{q}: before={b:.3f} now={c:.3f} ({d})  runs={[round(x,3) for x in cur["runs"][q]]}')
EOF

OUT=/tmp/ab_verify_${TAG}
rm -rf "$OUT"
SPARK_GRAFT_ONLY="$QS" SPARK_GRAFT_CPUS=8 \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT" >/dev/null 2>&1
python3 - "$QS" "$OUT" <<'EOF'
import json, sys
qs, out = set(sys.argv[1].split(',')), sys.argv[2]
full = json.load(open(f'{out}/oracle_sql.json'))
sub = {k: v for k, v in full.items() if k in qs}
json.dump(sub, open(f'{out}/oracle_sql.json', 'w'))
EOF
python3 scripts/check_oracle.py /root/testdata/sf0.01 "$OUT" 2>/dev/null | tail -5
