#!/usr/bin/env bash
# r16 100x campaign: close the ground-truth gap to 100% of the oracled
# surface (r15 verdict items 1-3). Four tranches:
#   mm : the whole multimodal family on the ENTROPY-BEARING 100x
#        staging (/tmp/graft_mm100, ScaleBench.stageMm — real ahash
#        entropy + group-of-10 near-dup structure), incl. mm_dedup,
#        whose r15 text-proxy run OOM'd before the hammingDedup
#        entropy-collapse guards landed.
#   cl : the closure trio (dedup_components, dedup_apply,
#        pipeline_corpus) against the r16 STAR-form oracle
#        (DedupCluster.edgeBiSql — linear edges, no 16x explosion),
#        which retires the r15 disk-budget adjudication.
#   a/b/c: the remaining small/mid keys + pipeline_curate. Keys whose
#        sf0.01 output is >=8k rows (>=8M at 100x) use the digest
#        discipline on BOTH sides (same reduction, r13).
# Same proven config as r14/r15: per-key DuckDB isolation, disk-backed
# CHECK_DB, staged CTEs for WITH-prefixed oracles, 48g Spark dumps.
# Usage: dev/r16_campaign.sh [tranche ...]   (default: all)
# NOT shipped code — dev loop only.
set -u
cd "$(dirname "$0")/.."
STAGED="${STAGED:-/tmp/graft_sf10}"
MMDIR="${MMDIR:-/tmp/graft_mm100}"
mkdir -p target /tmp/duckdb_spill

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"

dump() { # $1 = data dir, $2 = out dir, $3 = comma key list, $4 = heap,
         # $5 = digest key list (may be empty)
  echo "== dump [$3] heap=$4 digest=[$5] =="
  SPARK_GRAFT_ONLY="$3" SPARK_GRAFT_DIGEST="$5" \
    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTS=320 \
    java -Xmx"$4" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "$1" "$2" 2>"$2/dump_$(echo "$3" | cut -c1-24).err"
  echo "   exit=$?"
}

stage_of() { # $1 = out dir, $2 = comma key list -> WITH-prefixed subset
  python3 - "$1" "$2" <<'PYEOF'
import json, sys
o = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
print(",".join(k for k in sys.argv[2].split(",")
               if o.get(k, "").lstrip().upper().startswith("WITH")))
PYEOF
}

check() { # $1 = data dir, $2 = out dir, $3 = tag, $4 = keys (comma),
          # $5 = digest keys (comma)
  local stage; stage=$(stage_of "$2" "$4")
  echo "== check [$3] stage=[$stage] =="
  rm -f "/tmp/check100_$3.db" "/tmp/check100_$3.db.wal"
  SCALECHECK_ISOLATE=1 SCALECHECK_OUT="target/scalecheck100_r16$3.json" \
    CHECK_DB="/tmp/check100_$3.db" CHECK_MEM=60GB CHECK_THREADS=16 \
    CHECK_STAGE_KEYS="$stage" CHECK_DIGEST="$5" \
    python3 dev/scalecheck.py "$1" "$2" $(echo "$4" | tr ',' ' ')
  rm -f "/tmp/check100_$3.db" "/tmp/check100_$3.db.wal"
}

MM="mm_ahash,mm_binary,mm_chunks,mm_dedup,mm_framesample,mm_headers,source_binaryfile"
CL="dedup_components,dedup_apply,pipeline_corpus"
# big outputs -> digest (sf0.01 rows >= 8k: 8M-60M rows at 100x)
DIG_A="project_compute,filter_conditional,fn_json,set_union_all,sort_multi,scan_pruned"
DIG_B="ts_anomaly,ts_ewma,ts_gaps,ts_interpolate,ts_locf,ts_rolling_median"
DIG_C="win_first_last_value,win_frame_range,win_ignore_nulls,win_ranking,win_time_range"
A="agg_histogram,agg_minmax_by,agg_udaf,filter_conditional,fn_json,fn_levenshtein,fn_trycast,fn_xml,join_cross,join_left_outer,join_null_safe,profile_table,project_compute,scan_metadata,scan_parquet,scan_pruned,scan_time_range,set_union_all,sort_limit_topk,sort_multi"
B="sample_reservoir,sample_stratified,sample_weighted,source_avro,source_orc,sub_correlated,sub_exists_select,ts_anomaly,ts_cusum,ts_ewma,ts_gaps,ts_interpolate,ts_locf,ts_rolling_median,pipeline_curate"
C="text_chunk,text_fingerprint,text_normalize,text_pack,text_pii,text_quality,text_repetition,text_stats,text_tokens,text_wordcount,vec_norm,vec_quantize,win_analytic,win_distribution,win_first_last_value,win_frame_range,win_frame_rows,win_ignore_nulls,win_ranking,win_time_range"

run_mm() {
  local OUT=/tmp/v100_r16mm; mkdir -p "$OUT"
  dump "$MMDIR" "$OUT" "mm_ahash,mm_binary,mm_chunks,mm_headers" 48g ""
  dump "$MMDIR" "$OUT" "mm_dedup,mm_framesample,source_binaryfile" 64g ""
  check "$MMDIR" "$OUT" mm "$MM" ""
}

run_cl() {
  local OUT=/tmp/v100_r16cl; mkdir -p "$OUT"
  dump "$STAGED" "$OUT" "$CL" 64g ""
  check "$STAGED" "$OUT" cl "$CL" ""
}

run_a() {
  local OUT=/tmp/v100_r16a; mkdir -p "$OUT"
  dump "$STAGED" "$OUT" "agg_histogram,agg_minmax_by,agg_udaf,filter_conditional,fn_json,fn_levenshtein,fn_trycast" 48g "filter_conditional,fn_json"
  dump "$STAGED" "$OUT" "fn_xml,join_cross,join_left_outer,join_null_safe,profile_table,project_compute" 48g "project_compute"
  dump "$STAGED" "$OUT" "scan_metadata,scan_parquet,scan_pruned,scan_time_range,set_union_all,sort_limit_topk,sort_multi" 48g "scan_pruned,set_union_all,sort_multi"
  check "$STAGED" "$OUT" a "$A" "$DIG_A"
}

run_b() {
  local OUT=/tmp/v100_r16b; mkdir -p "$OUT"
  dump "$STAGED" "$OUT" "sample_reservoir,sample_stratified,sample_weighted,source_avro,source_orc,sub_correlated,sub_exists_select" 48g ""
  dump "$STAGED" "$OUT" "ts_anomaly,ts_cusum,ts_ewma,ts_gaps,ts_interpolate,ts_locf,ts_rolling_median,pipeline_curate" 48g "$DIG_B"
  check "$STAGED" "$OUT" b "$B" "$DIG_B"
}

run_c() {
  local OUT=/tmp/v100_r16c; mkdir -p "$OUT"
  dump "$STAGED" "$OUT" "text_chunk,text_fingerprint,text_normalize,text_pack,text_pii,text_quality,text_repetition" 48g ""
  dump "$STAGED" "$OUT" "text_stats,text_tokens,text_wordcount,vec_norm,vec_quantize,win_analytic,win_distribution" 48g ""
  dump "$STAGED" "$OUT" "win_first_last_value,win_frame_range,win_frame_rows,win_ignore_nulls,win_ranking,win_time_range" 48g "$DIG_C"
  check "$STAGED" "$OUT" c "$C" "$DIG_C"
}

TRANCHES=("$@"); [ $# -eq 0 ] && TRANCHES=(mm cl a b c)
for t in "${TRANCHES[@]}"; do
  case "$t" in
    mm) run_mm ;; cl) run_cl ;; a) run_a ;; b) run_b ;; c) run_c ;;
    *) echo "unknown tranche $t"; exit 2 ;;
  esac
done
