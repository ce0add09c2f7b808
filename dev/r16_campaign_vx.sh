#!/usr/bin/env bash
set -u
cd /root/repo
OUT=/tmp/v100_r16vx; mkdir -p "$OUT" target /tmp/duckdb_spill
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED"
dump() {
  SPARK_GRAFT_ONLY="$1" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE_PARTS=320 \
  java -Xmx48g $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify /tmp/graft_sf10 "$OUT" 2>"$OUT/dump_$(echo "$1" | cut -c1-20).err"
  echo "dump [$1] exit=$?"
}
dump "vec_centroid,vec_knn_ivf,vec_knn_ivf_table,dedup_semantic"
dump "vec_ivfpq,vec_ivfpq_bucketed"
dump "win_distribution"
ALL="vec_centroid,vec_knn_ivf,vec_knn_ivf_table,dedup_semantic,vec_ivfpq,vec_ivfpq_bucketed,win_distribution"
STAGE=$(python3 - "$OUT" "$ALL" <<'PYEOF'
import json, sys
o = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
print(",".join(k for k in sys.argv[2].split(",")
               if o.get(k, "").lstrip().upper().startswith("WITH")
               and not k.startswith("vec_ivfpq")))
PYEOF
)
echo "stage keys: $STAGE"
rm -f /tmp/check100_vx.db /tmp/check100_vx.db.wal
SCALECHECK_ISOLATE=1 SCALECHECK_OUT=target/scalecheck100_r16vx.json \
  CHECK_DB=/tmp/check100_vx.db CHECK_MEM=60GB CHECK_THREADS=16 \
  CHECK_STAGE_KEYS="$STAGE" \
  python3 dev/scalecheck.py /tmp/graft_sf10 "$OUT" $(echo "$ALL" | tr ',' ' ')
rm -f /tmp/check100_vx.db /tmp/check100_vx.db.wal
