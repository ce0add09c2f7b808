#!/usr/bin/env bash
# One-command evidence gate (r11/r12 verdict item): every claim a
# round makes — suite green, oracle match at two SFs, 10x-staging
# oracle match — behind a single entry point that writes one summary
# JSON. Run it BEFORE any commit that claims correctness; it exists
# precisely because r12 committed a red suite without noticing.
#
# Usage: dev/gate.sh [fast]
#   full (default): sbt test + Verify/check at sf0.01 AND sf0.1 +
#                   scalecheck over the 10x staging (if staged)
#   fast:           sbt test + Verify/check at sf0.01 only
#
# Output: target/gate.json  {"suite": "...", "sf001": "...", ...}
# Exit 0 iff every section passed. NOT shipped code — dev loop only.
set -u
cd "$(dirname "$0")/.."
mode="${1:-full}"
mkdir -p target
declare -A R

section() { echo "== gate: $1 =="; }

section "sbt test"
if sbt -batch test > target/gate_test.log 2>&1; then
  R[suite]=$(grep -E "Tests: succeeded" target/gate_test.log | tail -1 \
    | sed 's/^\[info\] //')
  suite_ok=1
else
  R[suite]="FAILED ($(grep -cE 'TESTS FAILED|\*\*\* FAILED' target/gate_test.log) markers; see target/gate_test.log)"
  suite_ok=0
fi
echo "  ${R[suite]}"

check_sf() { # $1 = sfdir, $2 = label
  section "verify+oracle $2"
  local out="/tmp/gate_v$2"
  if SPARK_GRAFT_CPUS=32 sbt -batch \
      "runMain graft.Verify $1 $out" > "target/gate_verify$2.log" 2>&1 \
     && python3 dev/check.py "$1" "$out" > "target/gate_check$2.log" 2>&1
  then
    R[$2]=$(tail -1 "target/gate_check$2.log")
    echo "  ${R[$2]}"
    return 0
  else
    R[$2]="FAILED: $(grep -m1 FAIL "target/gate_check$2.log" || echo 'see target/gate_*.log')"
    echo "  ${R[$2]}"
    return 1
  fi
}

ok=$suite_ok
check_sf /root/testdata/sf0.01 sf001 || ok=0
if [ "$mode" = full ]; then
  check_sf /root/testdata/sf0.1 sf01 || ok=0
  if [ -d /tmp/graft_sf1/lineitem.parquet ]; then
    section "scalecheck (10x staging)"
    if SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTS=320 sbt -batch \
        "runMain graft.Verify /tmp/graft_sf1 /tmp/gate_vsf1" \
        > target/gate_verify10x.log 2>&1 \
       && python3 dev/scalecheck.py /tmp/graft_sf1 /tmp/gate_vsf1 \
        > target/gate_check10x.log 2>&1
    then R[scale10x]=$(tail -1 target/gate_check10x.log); echo "  ${R[scale10x]}"
    else R[scale10x]="FAILED: see target/gate_check10x.log"; echo "  ${R[scale10x]}"; ok=0
    fi
  else
    R[scale10x]="skipped (no /tmp/graft_sf1 staging; run graft.ScaleBench first)"
  fi
fi

GATE_SECTIONS=$(for k in "${!R[@]}"; do printf '%s=%s\x1f' "$k" "${R[$k]}"; done) \
python3 - "$ok" <<'EOF'
import json, sys, os, datetime
ok = sys.argv[1] == "1"
doc = {"metric": "gate", "pass": ok,
       "utc": datetime.datetime.now(datetime.timezone.utc)
              .strftime("%Y-%m-%dT%H:%M:%SZ"),
       "sections": dict(kv.split("=", 1) for kv in os.environ.get(
           "GATE_SECTIONS", "").split("\x1f") if kv)}
json.dump(doc, open("target/gate.json", "w"), indent=1, sort_keys=True)
print("gate:", "PASS" if ok else "FAIL", "-> target/gate.json")
EOF
exit $(( 1 - ok ))
