#!/usr/bin/env bash
# r18 campaign (r17 verdict items 1, 3-7 — landing-day scale rows):
#   new  : 100x correctness for the r18 keys/changes — mm_gif (new),
#          pipeline_mm (three-modality rework) — on /tmp/graft_sf10.
#   mm18 : the same pair on the ENTROPY-BEARING multimodal staging
#          (/tmp/graft_mm100, re-staged if absent) — the r16
#          mm-family discipline.
#   x10  : 10x landing-day rows for the same keys -> _r18nk10x.
#   sb10 : full-surface timed 10x ScaleBench refresh (surface grew to
#          236 keys; now also records the graph per-unit denominators)
#          -> target/scalebench.json.
#   sb100 <label> : ONE full-surface timed 100x ScaleBench session ->
#          target/scalebench100_full_<label>.json (dedup_hamming
#          excluded by its pinned precondition via SPARK_GRAFT_SKIP —
#          now self-documented in the artifact's "skip" field). Also
#          records the kcore/jaccard per-unit denominators at the
#          real decade (r17 verdict item 7).
#   tws100 : TwsBench over /tmp/graft_sf10 -> target/twsbench100x.json
#          (st19/st23/st25 refresh at HEAD + the NEW st27 TTL'd
#          feature-map and st28 eviction-on LSH-insert rows, r17
#          verdict items 3/5).
# Every step's exit code is checked (r16 ADVICE).
# Usage: dev/r18_campaign.sh [new|mm18|x10|sb10|sb100 <label>|tws100] ...
# NOT shipped code — dev loop only.
set -u
cd "$(dirname "$0")/.."
STAGED="${STAGED:-/tmp/graft_sf10}"
STAGED10="${STAGED10:-/tmp/graft_sf1}"
MMDIR="${MMDIR:-/tmp/graft_mm100}"
mkdir -p target /tmp/duckdb_spill

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"

die() { echo "ABORT: $1" >&2; exit 1; }

dump() { # $1 data dir, $2 out dir, $3 keys, $4 heap
  echo "== dump [$3] heap=$4 =="
  mkdir -p "$2"
  SPARK_GRAFT_ONLY="$3" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTS=320 \
    java -Xmx"$4" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "$1" "$2" 2>"$2/dump_$(echo "$3" | cut -c1-20).err" \
    || die "Verify [$3] failed (see $2)"
}

stage_of() { # $1 out dir, $2 keys -> WITH-prefixed subset
  python3 - "$1" "$2" <<'PYEOF'
import json, sys
o = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
print(",".join(k for k in sys.argv[2].split(",")
               if o.get(k, "").lstrip().upper().startswith("WITH")))
PYEOF
}

check() { # $1 data dir, $2 out dir, $3 artifact tag, $4 keys
  local stage; stage=$(stage_of "$2" "$4")
  echo "== check [$3] stage=[$stage] =="
  rm -f "/tmp/check_$3.db" "/tmp/check_$3.db.wal"
  SCALECHECK_ISOLATE=1 SCALECHECK_OUT="target/scalecheck_$3.json" \
    CHECK_DB="/tmp/check_$3.db" CHECK_MEM=60GB CHECK_THREADS=16 \
    CHECK_STAGE_KEYS="$stage" \
    python3 dev/scalecheck.py "$1" "$2" $(echo "$4" | tr ',' ' ') \
    || die "scalecheck [$3] failed"
  rm -f "/tmp/check_$3.db" "/tmp/check_$3.db.wal"
}

NK="mm_gif,pipeline_mm"

run_new() {
  dump "$STAGED" /tmp/v100_r18nk "$NK" 64g
  check "$STAGED" /tmp/v100_r18nk 100_r18nk "$NK"
}

run_x10() {
  dump "$STAGED10" /tmp/v10_r18nk "$NK" 48g
  check "$STAGED10" /tmp/v10_r18nk 10x_r18nk "$NK"
}

run_mm18() {
  if [ ! -d "$MMDIR/documents.parquet" ]; then
    echo "== re-staging $MMDIR (stageMm; main staging reused) =="
    cp -f target/scalebench100.json /tmp/scalebench100.committed.json \
      2>/dev/null || true
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_MULT=100 \
      SPARK_GRAFT_SCALE_DIR="$STAGED" SPARK_GRAFT_SCALE_STAGE=skip \
      SPARK_GRAFT_MM_DIR="$MMDIR" SPARK_GRAFT_ONLY=scan_parquet \
      SPARK_GRAFT_CPUS=32 \
      java -Xmx48g $OPENS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.ScaleBench 2>/tmp/mm18_stage.err || die "stageMm failed"
    cp -f /tmp/scalebench100.committed.json target/scalebench100.json \
      2>/dev/null || true
  fi
  dump "$MMDIR" /tmp/v100_r18mm "$NK" 64g
  check "$MMDIR" /tmp/v100_r18mm 100_r18mm "$NK"
}

run_sb10() {
  echo "== full-surface 10x ScaleBench (refresh, 236-key surface) =="
  cat /proc/loadavg
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_MULT=10 \
    SPARK_GRAFT_SCALE_DIR="$STAGED10" SPARK_GRAFT_SCALE_STAGE=skip \
    SPARK_GRAFT_CPUS=32 \
    java -Xmx48g $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.ScaleBench 2>/tmp/sb10_r18.err || die "10x ScaleBench failed"
}

run_sb100() { # $1 session label
  local label="$1"
  echo "== full-surface TIMED 100x ScaleBench session '$label' =="
  cat /proc/loadavg
  cp -f target/scalebench100.json /tmp/scalebench100.committed.json \
    2>/dev/null || true
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_MULT=100 \
    SPARK_GRAFT_SCALE_DIR="$STAGED" SPARK_GRAFT_SCALE_STAGE=skip \
    SPARK_GRAFT_SKIP=dedup_hamming SPARK_GRAFT_CPUS=32 \
    java -Xmx64g $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.ScaleBench 2>/tmp/sb100_r18_"$label".err \
    || { cp -f /tmp/scalebench100.committed.json \
           target/scalebench100.json 2>/dev/null || true
         die "100x ScaleBench session $label failed"; }
  mv -f target/scalebench100.json "target/scalebench100_full_$label.json"
  cp -f /tmp/scalebench100.committed.json target/scalebench100.json \
    2>/dev/null || true
  echo "-> target/scalebench100_full_$label.json"
}

run_tws100() {
  echo "== TwsBench over $STAGED (st19/23/25 refresh + st27/st28) =="
  cat /proc/loadavg
  SPARK_GRAFT_SF_DIR="$STAGED" SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_TWS_OUT=target/twsbench100x.json \
    java -Xmx64g $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.streaming.TwsBench 2>/tmp/tws100_r18.err \
    || die "TwsBench 100x failed (laws require loudly — see /tmp/tws100_r18.err)"
  echo "-> target/twsbench100x.json"
}

[ $# -ge 1 ] || die "usage: dev/r18_campaign.sh [new|mm18|x10|sb10|sb100 <label>|tws100] ..."
while [ $# -ge 1 ]; do
  case "$1" in
    new) run_new; shift ;;
    mm18) run_mm18; shift ;;
    x10) run_x10; shift ;;
    sb10) run_sb10; shift ;;
    sb100) [ $# -ge 2 ] || die "sb100 needs a label"; run_sb100 "$2"; shift 2 ;;
    tws100) run_tws100; shift ;;
    *) die "unknown step $1" ;;
  esac
done
