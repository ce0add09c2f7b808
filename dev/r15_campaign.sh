#!/usr/bin/env bash
# r15 100x verification campaign (r14 verdict item 1): widen the
# ground-truth set past r14's 34 top-cost keys by the next ~28 keys by
# 10x-staging cost, plus the 4 r15 additions (source_kafka_shape and
# the three written-index layout variants). Composes the r14-proven
# config: per-key DuckDB isolation, disk-backed CHECK_DB, staged CTEs
# for WITH-prefixed oracles, 48g Spark heap, 320 shuffle partitions
# (~10/core) for the dumps.
#
# Usage: dev/r15_campaign.sh [stagedDir] [outDir]
# Writes target/scalecheck100_r15.json. NOT shipped code — dev loop.
set -u
cd "$(dirname "$0")/.."
STAGED="${1:-/tmp/graft_sf10}"
OUT="${2:-/tmp/v100_r15}"
mkdir -p "$OUT" target

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

# The r15 widening set: next-by-10x-cost keys not in r14's KEYS34
# (see dev/r14_campaign_env.sh), + the 4 r15 additions. profile_sketch
# and agg_approx_* are no-oracle-by-design and excluded.
NEW28="graph_pagerank,join_theta_range,ts_rate,sketch_bitmap_ops,agg_incremental,agg_active_users,graph_degree_dist,dedup_embed,agg_cohort_retention,join_asof_nearest,funnel_steps,vec_knn_ivf,join_multiway,join_interval_overlap,join_semi,sketch_kmv_ops,agg_path_ngrams,join_asof,cdc_apply,pipeline_ccnet,win_sessionize,dim_scd2_merge,scan_dpp,sub_lateral,text_ngrams,sub_exists_in,win_ntile,sink_bucketed"
R15NEW="source_kafka_shape,vec_knn_ivf_table,dedup_minhash_pairs_bucketed"
# vec_ivfpq_bucketed runs SOLO and UNSTAGED (its oracle SQL is
# vec_ivfpq's, whose staged-CTE form kills the spill disk — r14
# adjudication in dev/r14_campaign_env.sh).
SOLO="vec_ivfpq_bucketed"

# WITH-prefixed oracles get staged CTEs (disk-backed); the layout
# variants inherit their twins' WITH SQL.
STAGE="graph_pagerank,ts_rate,sketch_bitmap_ops,agg_incremental,agg_active_users,graph_degree_dist,dedup_embed,agg_cohort_retention,join_asof_nearest,funnel_steps,vec_knn_ivf,join_interval_overlap,sketch_kmv_ops,agg_path_ngrams,cdc_apply,pipeline_ccnet,win_sessionize,dim_scd2_merge,text_ngrams,win_ntile,source_kafka_shape,vec_knn_ivf_table,dedup_minhash_pairs_bucketed"

ALL="$NEW28,$R15NEW"

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
  # Batches sized so one JVM's session artifacts stay inside 48g.
  dump "graph_pagerank,graph_degree_dist,join_theta_range,join_asof,join_asof_nearest,join_semi,join_multiway" 48g
  dump "ts_rate,win_sessionize,win_ntile,funnel_steps,agg_cohort_retention,agg_active_users,agg_incremental" 48g
  dump "sketch_bitmap_ops,sketch_kmv_ops,agg_path_ngrams,cdc_apply,dim_scd2_merge,sub_lateral,sub_exists_in,text_ngrams" 48g
  dump "dedup_embed,pipeline_ccnet,join_interval_overlap,source_kafka_shape" 48g
  dump "vec_knn_ivf,vec_knn_ivf_table,vec_ivfpq_bucketed,dedup_minhash_pairs_bucketed" 48g
  dump "scan_dpp,sink_bucketed" 48g
fi

rm -f /tmp/check100_r15.db /tmp/check100_r15.db.wal
mkdir -p /tmp/duckdb_spill

echo "== scalecheck main set =="
SCALECHECK_ISOLATE=1 SCALECHECK_OUT=target/scalecheck100_r15.json \
  CHECK_DB=/tmp/check100_r15.db CHECK_MEM=60GB CHECK_THREADS=16 \
  CHECK_STAGE_KEYS="$STAGE" \
  python3 dev/scalecheck.py "$STAGED" "$OUT" \
  $(echo "$ALL" | tr ',' ' ')
MAIN_RC=$?

echo "== scalecheck solo (vec_ivfpq_bucketed, unstaged) =="
rm -f /tmp/check100_r15b.db /tmp/check100_r15b.db.wal
SCALECHECK_ISOLATE=1 SCALECHECK_OUT=target/scalecheck100_r15_ivfpq.json \
  CHECK_DB=/tmp/check100_r15b.db CHECK_MEM=60GB CHECK_THREADS=16 \
  python3 dev/scalecheck.py "$STAGED" "$OUT" $SOLO
SOLO_RC=$?

echo "main_rc=$MAIN_RC solo_rc=$SOLO_RC"
exit $(( MAIN_RC || SOLO_RC ))
