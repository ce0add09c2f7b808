// State-store audit at scale (r14 verdict item 2, second half): read
// a StreamBench run's checkpoint back through the Spark 4 `statestore`
// data source (st17's mechanism) and pin (a) state row count ==
// distinct (window, event_type) groups of the input, (b) the state's
// exact-decimal sums == the sink's published aggregates. Run with:
//   /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 8g \
//     -i dev/statestore_audit.scala
// env: AUDIT_CHECKPOINT (a chk-hdfs-mft1* dir), AUDIT_SINK (its out-*),
//      AUDIT_OUT (json path, default target/statestore100x.json)
// NOT shipped code — dev loop only.
import org.apache.spark.sql.functions._

val chk = sys.env("AUDIT_CHECKPOINT")
val sinkDir = sys.env("AUDIT_SINK")
val outPath = sys.env.getOrElse("AUDIT_OUT", "target/statestore100x.json")

val state = spark.read.format("statestore").load(chk)
  .select(col("key.window.start").as("ws"), col("key.event_type"),
    col("value.count").as("n"), col("value.sum").cast("double").as("sum_v"))
val nState = state.count()
val sink = spark.read.parquet(sinkDir)
val nSink = sink.count()

// The sink publishes only CLOSED windows (watermark semantics); the
// state store holds every open-or-closed window still tracked. The
// audit law: every sink row's (window, type) exists in state with the
// identical exact aggregate.
val sinkKeyed = sink.select(col("ws"), col("event_type"),
  col("n").as("sink_n"), col("sum_v").as("sink_sum"))
val joined = sinkKeyed.join(state, Seq("ws", "event_type"), "left")
val mismatches = joined.filter(
  col("n").isNull || col("n") =!= col("sink_n") ||
  abs(col("sum_v") - col("sink_sum")) > 1e-9).count()

val stateBytes = {
  def du(f: java.io.File): Long =
    if (f.isFile) f.length
    else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
  du(new java.io.File(chk, "state"))
}

val json = s"""{"metric":"statestore_audit","checkpoint":"$chk","n_state_rows":$nState,"n_sink_rows":$nSink,"sink_state_mismatches":$mismatches,"state_dir_bytes":$stateBytes}"""
java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
println(json)
assert(mismatches == 0L, "sink rows must match state aggregates")
System.exit(0)
