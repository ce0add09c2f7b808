#!/usr/bin/env bash
# r16 wave-2 100x rows: the two keys added this round (vec_lsh,
# text_bpe_encode) verified + timed at the 100x staging on landing
# day (the campaign discipline: no key ships without scale ground
# truth). Re-stages /tmp/graft_sf10 if absent (container restarts
# wipe /tmp; staging is deterministic). ScaleBench also times the two
# keys vs the sf0.1 base — its JSON is saved aside so the committed
# full-surface scalebench100.json is not clobbered by a 2-key run.
# Usage: dev/r16b_campaign.sh   NOT shipped code — dev loop only.
# r17 (ADVICE): each step's exit code is now checked and the script
# bails before moving artifacts — a crashed ScaleBench/Verify used to
# let the mv/scalecheck steps run against stale output, leaving a
# half-written target/*.json that looked like evidence.
set -u
cd "$(dirname "$0")/.."
STAGED="${STAGED:-/tmp/graft_sf10}"
OUT="${OUT:-/tmp/v100_r16nk}"
KEYS="vec_lsh,text_bpe_encode"
mkdir -p target /tmp/duckdb_spill "$OUT"

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"

STAGE_MODE=""
[ -f "$STAGED/lineitem.parquet" ] || [ -d "$STAGED/lineitem.parquet" ] \
  || STAGE_MODE="stage"
[ -n "$STAGE_MODE" ] || STAGE_MODE="skip"

echo "== ScaleBench 100x ($STAGE_MODE) + timing [$KEYS] =="
cp -f target/scalebench100.json /tmp/scalebench100.committed.json \
  2>/dev/null || true
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_MULT=100 \
  SPARK_GRAFT_SCALE_DIR="$STAGED" SPARK_GRAFT_SCALE_STAGE="$STAGE_MODE" \
  SPARK_GRAFT_ONLY="$KEYS" SPARK_GRAFT_CPUS=32 \
  java -Xmx48g $OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.ScaleBench 2>"$OUT/scalebench.err"
RC=$?
echo "   exit=$RC"
if [ $RC -ne 0 ]; then
  echo "ABORT: ScaleBench failed (see $OUT/scalebench.err)"; exit $RC
fi
mv -f target/scalebench100.json target/scalebench100_r16nk.json
cp -f /tmp/scalebench100.committed.json target/scalebench100.json \
  2>/dev/null || true

echo "== dump [$KEYS] =="
SPARK_GRAFT_ONLY="$KEYS" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_SHUFFLE_PARTS=320 \
  java -Xmx48g $OPENS -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify "$STAGED" "$OUT" 2>"$OUT/dump.err"
RC=$?
echo "   exit=$RC"
if [ $RC -ne 0 ]; then
  echo "ABORT: Verify failed (see $OUT/dump.err)"; exit $RC
fi

echo "== scalecheck =="
rm -f /tmp/check100_nk.db /tmp/check100_nk.db.wal
SCALECHECK_ISOLATE=1 SCALECHECK_OUT=target/scalecheck100_r16nk.json \
  CHECK_DB=/tmp/check100_nk.db CHECK_MEM=60GB CHECK_THREADS=16 \
  CHECK_STAGE_KEYS="$KEYS" \
  python3 dev/scalecheck.py "$STAGED" "$OUT" vec_lsh text_bpe_encode
RC=$?
rm -f /tmp/check100_nk.db /tmp/check100_nk.db.wal
echo "rc=$RC"
exit $RC
