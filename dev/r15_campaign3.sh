#!/usr/bin/env bash
# r15 100x campaign, tranche 3: the next 24 keys by the FRESH r15 10x
# ScaleBench cost ranking (dimension-table ops, the fn_* family at
# fact scale, set ops, and dedup_minhash_pairs itself — the cached
# twin of the r15 bucketed key, now verified directly). Same config
# as tranches 1-2. Writes target/scalecheck100_r15c.json.
set -u
cd "$(dirname "$0")/.."
STAGED="${1:-/tmp/graft_sf10}"
OUT="${2:-/tmp/v100_r15c}"
mkdir -p "$OUT" target

OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"

ALL="dim_lookup_pit,dim_scd2,dim_snapshot,fn_encode,fn_struct,fn_unpivot,dedup_minhash_pairs,fn_collation,agg_ab_test,graph_triangles,join_broadcast,curate_mix_temperature,agg_corrmatrix,join_anti,sample_split_leakproof,fn_map,join_bloom,agg_bitwise,set_except,agg_bitmap_distinct,dedup_exact,sub_scalar,fn_math,text_lmscore"

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
  dump "dim_lookup_pit,dim_scd2,dim_snapshot,agg_ab_test,agg_corrmatrix,agg_bitwise,agg_bitmap_distinct,sub_scalar" 48g
  dump "fn_encode,fn_struct,fn_unpivot,fn_collation,fn_map,fn_math" 48g
  dump "dedup_minhash_pairs,dedup_exact,text_lmscore,sample_split_leakproof,curate_mix_temperature" 48g
  dump "graph_triangles,join_broadcast,join_anti,join_bloom,set_except" 48g
fi

STAGE=$(python3 - "$OUT" "$ALL" <<'PYEOF'
import json, sys
o = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
print(",".join(k for k in sys.argv[2].split(",")
               if o.get(k, "").lstrip().upper().startswith("WITH")))
PYEOF
)
echo "stage keys: $STAGE"

rm -f /tmp/check100_r15d.db /tmp/check100_r15d.db.wal
mkdir -p /tmp/duckdb_spill

SCALECHECK_ISOLATE=1 SCALECHECK_OUT=target/scalecheck100_r15c.json \
  CHECK_DB=/tmp/check100_r15d.db CHECK_MEM=60GB CHECK_THREADS=16 \
  CHECK_STAGE_KEYS="$STAGE" \
  python3 dev/scalecheck.py "$STAGED" "$OUT" \
  $(echo "$ALL" | tr ',' ' ')
