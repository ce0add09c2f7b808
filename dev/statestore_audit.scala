// State-store audit at scale (r14 verdict item 2, second half): read
// a StreamBench run's checkpoint back through the Spark 4 `statestore`
// data source (st17's mechanism) and pin (a) state row count ==
// distinct (window, event_type) groups of the input, (b) the state's
// exact-decimal sums == the sink's published aggregates. Run with:
//   /opt/spark/bin/spark-shell --master 'local[16]' --driver-memory 8g \
//     -i dev/statestore_audit.scala
// env: AUDIT_CHECKPOINT (a chk-hdfs-mft1* dir), AUDIT_SINK (its out-*),
//      AUDIT_OUT (json path, default target/statestore100x.json)
// NOT shipped code -- dev loop only.
import org.apache.spark.sql.functions._

// The `statestore` batch source resolves state via the session's
// StateStoreCoordinator RPC endpoint, which only exists after a
// streaming query has run in this session (st17 reads in the same
// session as its query; a fresh shell dies with
// RpcEndpointNotFoundException). Warm it with a one-trigger stateful
// no-op over the rate source.
{
  val warmChk = java.nio.file.Files.createTempDirectory("warmchk").toString
  val w = spark.readStream.format("rate").option("rowsPerSecond", "1")
    .load().groupBy().count()
    .writeStream.format("memory").queryName("coord_warmup")
    .outputMode("complete")
    .option("checkpointLocation", warmChk)
    .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    .start()
  w.awaitTermination()
}

val chk = sys.env("AUDIT_CHECKPOINT")
val sinkDir = sys.env("AUDIT_SINK")
val outPath = sys.env.getOrElse("AUDIT_OUT", "target/statestore100x.json")

// WHAT the audit pins (and why n_state_rows is tiny -- the point):
// the pipeline is a WATERMARKED tumbling aggregation in append mode,
// so a window's state row is EVICTED the moment the watermark closes
// it and its result is published to the sink. After draining the
// whole input, the store holds only the open tail the final
// watermark could not close. Laws:
//  1. CLOSURE ACCOUNTING (exactly-once, no group lost): closed(sink)
//     + open(state) == distinct (window, type) groups of the raw
//     input, with zero overlap.
//  2. BOUNDED STATE: state rows << sink rows and the state dir is
//     KB-sized after 10M events -- eviction is what makes 100-TB
//     streaming state finite; an unbounded store here would mean the
//     watermark silently stopped advancing.
//  3. The open rows' aggregates equal the batch recompute of their
//     groups (the exact-decimal buffer survives the store).
val state = spark.read.format("statestore").load(chk)
  .select(col("key.window.start").as("ws"), col("key.event_type"),
    col("value.count").as("n"), col("value.sum").cast("double").as("sum_v"))
val nState = state.count()
val sink = spark.read.parquet(sinkDir)
val nSink = sink.count()

val events = spark.read.parquet(sys.env("AUDIT_EVENTS"))
val canonical = (if (events.schema("ts").dataType ==
    org.apache.spark.sql.types.LongType)
  events.withColumn("ts", timestamp_micros(expr("ts div 1000")))
else events.withColumn("ts", col("ts").cast("timestamp")))
val groups = canonical
  .select(window(col("ts"), "1 hour")("start").as("ws"),
    col("event_type"))
  .distinct()
val nGroups = groups.count()

val sinkKeys = sink.select(col("ws"), col("event_type"))
val stateKeys = state.select(col("ws"), col("event_type"))
val overlap = sinkKeys.intersect(stateKeys).count()
val covered = sinkKeys.union(stateKeys).distinct().count()

// Law 3: open state rows == batch recompute of those groups.
val recompute = canonical
  .groupBy(window(col("ts"), "1 hour")("start").as("ws"),
    col("event_type"))
  .agg(count(lit(1)).as("bn"),
    sum(col("value").cast("decimal(18,2)")).cast("double").as("bsum"))
val openMismatch = state.join(recompute, Seq("ws", "event_type"), "left")
  .filter(col("bn").isNull || col("bn") =!= col("n") ||
    abs(col("bsum") - col("sum_v")) > 1e-9).count()

val stateBytes = {
  def du(f: java.io.File): Long =
    if (f.isFile) f.length
    else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
  du(new java.io.File(chk, "state"))
}

val json = s"""{"metric":"statestore_audit","checkpoint":"$chk","n_state_rows":$nState,"n_sink_rows":$nSink,"n_input_groups":$nGroups,"sink_state_overlap":$overlap,"groups_covered":$covered,"open_state_mismatches":$openMismatch,"state_dir_bytes":$stateBytes}"""
java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
println(json)
assert(overlap == 0L, "a group must be closed (sink) XOR open (state)")
assert(covered == nGroups && nSink + nState == nGroups,
  "closure accounting: sink + state must partition the input groups")
assert(openMismatch == 0L, "open state rows must equal batch recompute")
System.exit(0)
