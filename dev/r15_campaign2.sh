#!/usr/bin/env bash
# r15 100x campaign, tranche 2: the next ~20 keys by cost — the
# sf0.1-bench-expensive keys the 10x-cost ranking under-weighted
# (text_contamination, vec_pq) plus the full near-dup pipeline family
# (minhash cluster/apply, simhash, semantic, mm_dedup) that r14's
# top-cost triage skipped. Same proven config as dev/r15_campaign.sh;
# CHECK_STAGE_KEYS derived from the dumped oracle_sql.json instead of
# a hand-kept list.
#
# Usage: dev/r15_campaign2.sh [stagedDir] [outDir]
# Writes target/scalecheck100_r15b.json. NOT shipped code — dev loop.
set -u
cd "$(dirname "$0")/.."
STAGED="${1:-/tmp/graft_sf10}"
OUT="${2:-/tmp/v100_r15b}"
mkdir -p "$OUT" target

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

ALL="text_contamination,text_decontaminate,vec_pq,text_bm25,ts_lagcorr,dedup_minhash,dedup_minhash_cluster,pipeline_neardup,dedup_near,dedup_simhash,dedup_semantic,win_seqpattern,source_parquet_evolve,funnel_window,curate_mix_apply,join_spatial_grid,sink_compaction_plan,sketch_cms,source_text,mm_dedup"

dump() { # $1 = comma key list, $2 = heap
  echo "== dump [$1] heap=$2 =="
  SPARK_GRAFT_ONLY="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTS=320 \
    java -Xmx"$2" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "$STAGED" "$OUT" 2>"$OUT/dump_$(echo "$1" | cut -c1-24).err"
  echo "   exit=$?"
}

if [ "${SKIP_DUMP:-0}" != "1" ]; then
  # The minhash pipeline family shares one session's cached
  # signature/pair/component artifacts — batch them together so the
  # fixpoint is paid once.
  dump "dedup_minhash,dedup_minhash_cluster,pipeline_neardup" 48g
  dump "dedup_near,dedup_simhash,dedup_semantic,mm_dedup" 48g
  dump "text_contamination,text_decontaminate,text_bm25,ts_lagcorr" 48g
  dump "vec_pq,win_seqpattern,source_parquet_evolve,funnel_window" 48g
  dump "curate_mix_apply,join_spatial_grid,sink_compaction_plan,sketch_cms,source_text" 48g
fi

# WITH-prefixed oracles -> staged CTEs (disk-backed DB), derived from
# the dump's own oracle_sql.json. source_text's oracle reads the raw
# table (no WITH); RECURSIVE auto-falls-back inside check.py.
STAGE=$(python3 - "$OUT" "$ALL" <<'PYEOF'
import json, sys
o = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
keys = sys.argv[2].split(",")
print(",".join(k for k in keys
               if o.get(k, "").lstrip().upper().startswith("WITH")))
PYEOF
)
echo "stage keys: $STAGE"

rm -f /tmp/check100_r15b2.db /tmp/check100_r15b2.db.wal
mkdir -p /tmp/duckdb_spill

SCALECHECK_ISOLATE=1 SCALECHECK_OUT=target/scalecheck100_r15b.json \
  CHECK_DB=/tmp/check100_r15b2.db CHECK_MEM=60GB CHECK_THREADS=16 \
  CHECK_STAGE_KEYS="$STAGE" \
  python3 dev/scalecheck.py "$STAGED" "$OUT" \
  $(echo "$ALL" | tr ',' ' ')
