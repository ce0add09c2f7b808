#!/usr/bin/env bash
# One-command evidence gate (r11/r12 verdict item): every claim a
# round makes — suite green, oracle match at two SFs, 10x-staging
# oracle match — behind a single entry point that writes one summary
# JSON. Run it BEFORE any commit that claims correctness; it exists
# precisely because r12 committed a red suite without noticing.
#
# Usage: dev/gate.sh [fast|100x]
#   full (default): sbt test + Verify/check at sf0.01 AND sf0.1 +
#                   scalecheck over the 10x staging (if staged)
#   fast:           sbt test + Verify/check at sf0.01 only
#   100x:           full PLUS the scale100x section (r16 verdict item
#                   7): the ENTIRE oracled surface re-proven over
#                   /tmp/graft_sf10 — per-key DuckDB isolation,
#                   staged CTEs auto-detected from the WITH prefix,
#                   the digest reduction for the >=8k-row outputs,
#                   dedup_hamming excluded by its pinned precondition
#                   (SURVEY: the 16-bit teaching variant saturates at
#                   100x; its one-time digest row stands in
#                   target/scalecheck100.json). The 100x record is
#                   the repo's crown evidence — this makes ONE
#                   command able to re-prove it after any change.
#                   Expect 1-2 h; a separate mode so `full` stays the
#                   per-change loop.
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
if [ "$mode" = full ] || [ "$mode" = 100x ]; then
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

if [ "$mode" = 100x ]; then
  if [ -d /tmp/graft_sf10/lineitem.parquet ]; then
    section "scalecheck (100x staging)"
    OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
    OUT100=/tmp/gate_v100x
    mkdir -p "$OUT100" /tmp/duckdb_spill
    s100_ok=1
    # Three bounded dump sessions (alphabetical thirds) — one giant
    # session would hold every SessionCache index at once; the split
    # is the r16 campaign's proven memory discipline in one command.
    SKIP100="${GATE_100X_SKIP:-dedup_hamming}"
    # Digest set = every key whose full output is too large to
    # hash-compare row-wise at 100x (the r13 reduction; list pinned
    # at its use below). It must reach BOTH sides: the Spark dump
    # (SPARK_GRAFT_DIGEST) and the DuckDB check (CHECK_DIGEST) — the
    # first end-to-end run of this mode failed on exactly this:
    # dump-side full-form vs check-side digest = 18 'columns differ'.
    DIG100="project_compute,filter_conditional,fn_json,set_union_all,sort_multi,scan_pruned,ts_anomaly,ts_ewma,ts_gaps,ts_interpolate,ts_locf,ts_rolling_median,win_first_last_value,win_frame_range,win_ignore_nulls,win_ranking,win_time_range,join_spatial_grid"
    mapfile -t THIRDS < <(python3 - "$SKIP100" <<'EOF'
import json, subprocess, sys
keys = sorted(json.load(open("/tmp/gate_vsf001/oracle_sql.json")))
skip = set(sys.argv[1].split(","))
keys = [k for k in keys if k not in skip]
n = (len(keys) + 2) // 3
for i in range(0, len(keys), n):
    print(",".join(keys[i:i + n]))
EOF
)
    for third in "${THIRDS[@]}"; do
      echo "  dump [${third%%,*}..] ($(echo "$third" | tr ',' '\n' | wc -l) keys)"
      SPARK_GRAFT_ONLY="$third" SPARK_GRAFT_DIGEST="$DIG100" \
        SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_SHUFFLE_PARTS=320 \
        java -Xmx64g $OPENS -Dspark.ui.enabled=false \
        -Dspark.sql.session.timeZone=UTC \
        -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
        graft.Verify /tmp/graft_sf10 "$OUT100" \
        2>>target/gate_dump100x.log || s100_ok=0
    done
    ALLKEYS=$(printf '%s,' "${THIRDS[@]}"); ALLKEYS=${ALLKEYS%,}
    STAGE100=$(python3 - "$OUT100" "$ALLKEYS" <<'EOF'
import json, sys
o = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
print(",".join(k for k in sys.argv[2].split(",")
               if o.get(k, "").lstrip().upper().startswith("WITH")))
EOF
)
    rm -f /tmp/gate_check100x.db /tmp/gate_check100x.db.wal
    if SCALECHECK_ISOLATE=1 SCALECHECK_OUT=target/scalecheck100_gate.json \
        CHECK_DB=/tmp/gate_check100x.db CHECK_MEM=60GB CHECK_THREADS=16 \
        CHECK_STAGE_KEYS="$STAGE100" CHECK_DIGEST="$DIG100" \
        python3 dev/scalecheck.py /tmp/graft_sf10 "$OUT100" \
          $(echo "$ALLKEYS" | tr ',' ' ') > target/gate_check100x.log 2>&1 \
        && [ "$s100_ok" = 1 ]
    then R[scale100x]="$(tail -1 target/gate_check100x.log) (skip: $SKIP100)"
    else R[scale100x]="FAILED: see target/gate_check100x.log"; ok=0
    fi
    rm -f /tmp/gate_check100x.db /tmp/gate_check100x.db.wal
    echo "  ${R[scale100x]}"
  else
    # r17 ADVICE (medium): a silently-skipped 100x section used to
    # leave ok=1, so `gate.sh 100x` could exit 0 while re-proving
    # nothing. Asking for 100x mode without the staging is now a
    # FAIL unless the caller explicitly accepts the skip.
    if [ "${GATE_100X_ALLOW_SKIP:-0}" = 1 ]; then
      R[scale100x]="skipped (no /tmp/graft_sf10 staging; GATE_100X_ALLOW_SKIP=1)"
    else
      R[scale100x]="FAILED: no /tmp/graft_sf10 staging (run graft.ScaleBench with SPARK_GRAFT_SCALE_MULT=100, or set GATE_100X_ALLOW_SKIP=1)"
      ok=0
    fi
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
