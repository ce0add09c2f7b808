#!/usr/bin/env bash
# r15 100x campaign, tranche 3: the next 24 keys by the FRESH r15 10x
# ScaleBench cost ranking (dimension-table ops, the fn_* family at
# fact scale, set ops, and dedup_minhash_pairs itself — the cached
# twin of the r15 bucketed key, now verified directly). Same config
# as tranches 1-2. Writes target/scalecheck100_r15e.json.
set -u
cd "$(dirname "$0")/.."
STAGED="${1:-/tmp/graft_sf10}"
OUT="${2:-/tmp/v100_r15e}"
mkdir -p "$OUT" target

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

ALL="agg_first_last,source_csv,source_json,agg_weighted_median,ts_resample,agg_rollup,filter_in_like_between,agg_gini,win_streak,agg_pivot,agg_listagg,ts_seasonality,agg_distinct,fn_hash,agg_skewkurt,agg_stats,text_diversity,dedup_apply,ts_ohlc,fn_string,agg_boolean,sample_split,fn_array_hof,fn_variant,agg_filtered,fn_regex"

dump() {
  echo "== dump [$1] heap=$2 =="
  SPARK_GRAFT_ONLY="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTS=320 \
    java -Xmx"$2" $OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "$STAGED" "$OUT" 2>"$OUT/dump_$(echo "$1" | cut -c1-24).err"
  echo "   exit=$?"
}

if [ "${SKIP_DUMP:-0}" != "1" ]; then
  dump "agg_first_last,source_csv,source_json,agg_weighted_median,ts_resample,agg_rollup,filter_in_like_between" 48g
  dump "agg_gini,win_streak,agg_pivot,agg_listagg,ts_seasonality,agg_distinct,fn_hash" 48g
  dump "agg_skewkurt,agg_stats,text_diversity,dedup_apply,ts_ohlc,fn_string,agg_boolean" 48g
  dump "sample_split,fn_array_hof,fn_variant,agg_filtered,fn_regex" 48g
fi

STAGE=$(python3 - "$OUT" "$ALL" <<'PYEOF'
import json, sys
o = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
print(",".join(k for k in sys.argv[2].split(",")
               if o.get(k, "").lstrip().upper().startswith("WITH")))
PYEOF
)
echo "stage keys: $STAGE"

rm -f /tmp/check100_r15f.db /tmp/check100_r15f.db.wal
mkdir -p /tmp/duckdb_spill

SCALECHECK_ISOLATE=1 SCALECHECK_OUT=target/scalecheck100_r15e.json \
  CHECK_DB=/tmp/check100_r15f.db CHECK_MEM=60GB CHECK_THREADS=16 \
  CHECK_STAGE_KEYS="$STAGE" \
  python3 dev/scalecheck.py "$STAGED" "$OUT" \
  $(echo "$ALL" | tr ',' ' ')
