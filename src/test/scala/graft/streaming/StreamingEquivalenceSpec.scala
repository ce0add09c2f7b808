package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** §5.5 batch-equivalence harness: every 2.I streaming op replayed via
  * the file source (chunked, AvailableNow) must end in the same state
  * as its batch analogue on the same data. Substitutes for the missing
  * SQL oracle on streaming (SURVEY.md §2.I).
  */
class StreamingEquivalenceSpec extends SparkTestBase {

  import spark.implicits._

  /** Batch events for the equivalence side. */
  private def batchEvents: DataFrame = Tables.load(spark, sf, "events")

  /** Stage the sf0.001 events as a 5-chunk replay (plus watermark
    * sentinel when append-mode emission needs flushing). */
  private def replayDir(name: String, sentinel: Boolean): String = {
    val dir = scratch(s"replay_$name")
    EventStreams.stageReplay(spark, sf, dir, chunks = 5, sentinel)
    dir
  }

  /** Pick the final st7-state row per user: `n` (the state's running
    * event count) strictly increases with every update a user receives,
    * so max-n per user is the last emitted state regardless of how the
    * memory sink ordered the batches. */
  private def finalStatePerUser(updates: DataFrame): DataFrame = updates
    .withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"n".desc)))
    .filter($"rn" === 1)
    .select($"user_id", $"n", $"sum_cents", $"last_id")

  private def runToMemory(df: DataFrame, name: String, mode: String)
      : DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    lastStateOps = Option(q.lastProgress)
      .map(_.stateOperators.map(_.operatorName).toSeq).getOrElse(Nil)
    spark.table(name)
  }

  /** State operators of the LAST micro-batch of the most recent
    * runToMemory query — lets the chained-stateful tests (st24,
    * st26) assert BOTH operators genuinely ran as state machines
    * (a future planner change that fused or dropped one would keep
    * the equivalence green while silently changing the state
    * story). */
  private var lastStateOps: Seq[String] = Nil

  /** Stage events as raw CSV LINES for st18 (the text-source twin of
    * stageReplay): every 13th line corrupted (pipeline_sensor's rule),
    * time-ordered 5-chunk text files, plus a far-future VALID
    * heartbeat line whose ts flushes every real window. It must be
    * valid: Catalyst pushes the validity filter's non-event-time
    * conjuncts below the watermark node, so an invalid sentinel never
    * reaches the watermark operator (see sensorPipeline's scaladoc). */
  private def lineReplayDir(name: String): String = {
    import scala.jdk.CollectionConverters._
    val dir = scratch(s"replay_$name")
    val csvOpts = Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSS")
    val ev = Tables.load(spark, sf, "events").orderBy($"ts", $"event_id")
      .select(when($"event_id" % 13 === 0,
          concat(lit("corrupt line #"), $"event_id"))
        .otherwise(to_csv(struct($"event_id", $"ts", $"user_id",
          $"event_type", $"value", $"props"), csvOpts.asJava))
        .as("value"))
    val per = math.max(1L, (ev.count() + 4) / 5)
    val chunked = ev.coalesce(1)
      .withColumn("chunk", (monotonically_increasing_id() / per).cast("int"))
    (0 to 4).foreach { i =>
      val tmp = s"${dir}_tmp"
      chunked.filter($"chunk" === i).select($"value")
        .coalesce(1).write.mode("overwrite").text(tmp)
      EventStreams.promoteChunk(tmp, dir, i, ".txt")
    }
    val maxTs = Tables.load(spark, sf, "events").agg(max($"ts"))
      .head().getTimestamp(0)
    val farIso = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
      .format(new java.util.Date(maxTs.getTime + 48L * 3600 * 1000))
    val tmp = s"${dir}_tmp"
    Seq(s"9223372036854775807,$farIso,-1,click,0.0,{}").toDF("value")
      .coalesce(1).write.mode("overwrite").text(tmp)
    EventStreams.promoteChunk(tmp, dir, 6, ".txt")
    dir
  }

  test("st18: full sensor pipeline over a raw CSV line stream == batch") {
    // The streaming twin of the oracled batch `pipeline_sensor` key:
    // same corrupt-line rule, same LineParser, same exact-cents
    // windows — replayed incrementally in 6 micro-batches, final
    // append-mode output must equal one batch pass over the same text.
    // The heartbeat sentinel's own far-future window is the one row
    // append mode can never emit (the watermark stops 1h short of it),
    // so the batch side excludes windows past the real data.
    val dir = lineReplayDir("st18")
    val maxTs = Tables.load(spark, sf, "events").agg(max($"ts"))
      .head().getTimestamp(0)
    val stream = spark.readStream.option("maxFilesPerTrigger", 1)
      .text(dir)
    val got = runToMemory(StreamQueries.sensorPipeline(stream),
      "st18_out", "append")
    val want = StreamQueries.sensorPipeline(spark.read.text(dir))
      .filter($"ws" <= lit(maxTs))
    assert(got.count() > 0, "st18 emitted nothing")
    assertSameRows(got, want, "st18 stream vs batch")
  }

  test("st1+st2: tumbling window over file stream == batch (complete)") {
    val stream = EventStreams.readEventStream(
      spark, replayDir("st2", sentinel = false))
    val got = runToMemory(StreamQueries.tumbling(stream), "st2_out",
      "complete")
    assertSameRows(got, StreamQueries.tumbling(batchEvents), "st2")
  }

  test("st14: streaming KMV sketch == batch UDAF == oracled sketch_kmv") {
    val stream = EventStreams.readEventStream(
      spark, replayDir("st14", sentinel = false))
    val got = runToMemory(StreamQueries.kmvSketch(stream),
      "st14_out", "complete")
    // Micro-batch incremental state == one batch pass (merge law)...
    assertSameRows(got, StreamQueries.kmvSketch(batchEvents),
      "st14 vs batch UDAF")
    // ...== the windowed-top-k batch query that DuckDB hash-verifies:
    // the streaming state is transitively pinned to the cross-engine
    // oracle (drop the contract ORDER BY; assertSameRows sorts).
    assertSameRows(got,
      graft.SparkEntry.queries("sketch_kmv")(spark, sf),
      "st14 vs oracled sketch_kmv")
  }

  test("st15: streaming bitmap distinct == batch == exact count") {
    val stream = EventStreams.readEventStream(
      spark, replayDir("st15", sentinel = false))
    val got = runToMemory(StreamQueries.bitmapDistinct(stream),
      "st15_out", "complete")
    // Incremental OR-merged state == one batch pass (bit-level: the
    // md5 state digests must match, not just the counts).
    assertSameRows(got, StreamQueries.bitmapDistinct(batchEvents),
      "st15 vs batch bitmaps")
    // Popcount rollup == the plain exact distinct — the bitmap
    // pipeline is exact, unlike st13/st14's estimators.
    assertSameRows(
      got.groupBy($"event_type").agg(sum($"n_users").as("n")),
      batchEvents.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n")),
      "st15 popcount sum vs exact distinct")
  }

  test("st17: statestore reader exposes checkpoint state == batch") {
    val dir = replayDir("st17", sentinel = false)
    val chk = scratch("chk_st17")
    val q = StreamQueries.tumbling(
        EventStreams.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("st17_out")
      .option("checkpointLocation", chk)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // The checkpoint's state store, read back as a batch table, must
    // equal both the batch recompute and what the query published.
    val state = StreamQueries.tumblingStateOf(spark, chk)
    assertSameRows(state, StreamQueries.tumbling(batchEvents),
      "statestore vs batch recompute")
    assertSameRows(state, spark.table("st17_out"),
      "statestore vs published sink rows")
  }

  test("st13: streaming HLL approx-distinct == batch estimate exactly") {
    // Registers are order-free, so chunked incremental updates and one
    // batch pass must agree BIT-EXACTLY, not just within rsd.
    val stream = EventStreams.readEventStream(
      spark, replayDir("st13", sentinel = false))
    val got = runToMemory(StreamQueries.approxDistinct(stream),
      "st13_out", "complete")
    assertSameRows(got, StreamQueries.approxDistinct(batchEvents), "st13")
  }

  test("st3: sliding window == batch (complete)") {
    val stream = EventStreams.readEventStream(
      spark, replayDir("st3", sentinel = false))
    val got = runToMemory(StreamQueries.sliding(stream), "st3_out",
      "complete")
    assertSameRows(got, StreamQueries.sliding(batchEvents), "st3")
  }

  test("st4: session windows (append + watermark sentinel) == batch") {
    val stream = EventStreams.readEventStream(
      spark, replayDir("st4", sentinel = true))
    val got = runToMemory(
      StreamQueries.sessions(stream.withWatermark("ts", "1 hour")),
      "st4_out", "append")
    // Sentinel session (user -1) is never emitted: the watermark stops
    // 1h before it. Everything real must match the batch analogue.
    assertSameRows(got, StreamQueries.sessions(batchEvents), "st4")
  }

  test("st5: watermarked tumbling emits all real windows, drops late data") {
    val dir = replayDir("st5", sentinel = true)
    // Append one LATE file after the sentinel: an event 48h before the
    // sentinel-advanced watermark — must be dropped, not re-open its
    // window.
    val minTs = batchEvents.agg(min($"ts")).head().getTimestamp(0)
    Seq((999999L, minTs, 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = EventStreams.readEventStream(spark, dir)
    val got = runToMemory(StreamQueries.tumblingWatermarked(stream),
      "st5_out", "append")
    // == batch over the ORIGINAL events only: sentinel window unemitted,
    // late row dropped.
    assertSameRows(got, StreamQueries.tumbling(batchEvents), "st5")
  }

  test("st6: dropDuplicatesWithinWatermark == batch distinct") {
    val dir = scratch("replay_st6")
    val ev = batchEvents.orderBy($"ts", $"event_id").limit(400)
    ev.coalesce(1).write.mode("append").parquet(dir)
    // Second chunk repeats 200 of the same events (duplicate ids).
    ev.limit(200).coalesce(1).write.mode("append").parquet(dir)
    val stream = EventStreams.readEventStream(spark, dir)
    val got = runToMemory(StreamQueries.dedupWithinWatermark(stream),
      "st6_out", "append")
    assertSameRows(got, StreamQueries.dedupWithinWatermark(ev), "st6")
  }

  test("st7: mapGroupsWithState running summary converges to batch agg") {
    val stream = EventStreams.readEventStream(
      spark, replayDir("st7", sentinel = false))
    val got = runToMemory(
      StreamQueries.userRunningSummary(
        stream.as[StreamQueries.EventRow]).toDF(),
      "st7_out", "update")
    // Update mode emits one row per user per touching batch; `n` is the
    // state's own event count, strictly increasing per update, so the
    // max-n row per user IS the final state — no reliance on memory-sink
    // row order.
    assertSameRows(finalStatePerUser(got),
      StreamQueries.userSummaryBatch(batchEvents), "st7")
  }

  test("st7b: transformWithState (RocksDB) matches mapGroupsWithState") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val stream = EventStreams.readEventStream(
        spark, replayDir("st7b", sentinel = false))
      val got = runToMemory(
        StreamQueries.userRunningSummaryTws(
          stream.as[StreamQueries.EventRow]).toDF(),
        "st7b_out", "update")
      assertSameRows(finalStatePerUser(got),
        StreamQueries.userSummaryBatch(batchEvents), "st7b")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("st7c: transformWithState event-time TIMER emits offline alerts == batch") {
    // The timer twin of st12 on the Spark 4 API: every real user's
    // summary must arrive via handleExpiredTimer once the sentinel
    // advances the watermark past last-seen + 2h, and must equal the
    // batch recompute. The sentinel user (-1) never fires: its own
    // timer sits 3h past the final watermark.
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val stream = EventStreams.readEventStream(
        spark, replayDir("st7c", sentinel = true))
      val got = runToMemory(
        StreamQueries.offlineAlertsTws(
          stream.as[StreamQueries.EventRow]).toDF(),
        "st7c_out", "append")
      assertSameRows(got,
        StreamQueries.offlineAlertsBatch(batchEvents), "st7c")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("st19: incremental transformWithState minhash == batch signatures") {
    // The dedup family's streaming twin (r10 verdict item 5): per-doc
    // minhash state maintained incrementally over a token stream must
    // end BIT-EQUAL to the batch dedup_minhash signature relation
    // (which DuckDB hash-verifies). Tokens are deliberately staged
    // TERM-ordered, so one doc's tokens scatter across the 5 replay
    // chunks and the elementwise-min merge across micro-batches is
    // actually exercised, not just one-shot per doc.
    val dir = scratch("replay_st19")
    val tok = graft.operators.TextBlocking.tokens(spark, sf)
      .orderBy($"term", $"doc_id")
    val rows = tok.count()
    val per = math.max(1L, (rows + 4) / 5)
    val chunked = tok.coalesce(1)
      .withColumn("chunk", (monotonically_increasing_id() / per).cast("int"))
      .cache()
    try {
      (0 to 4).foreach { i =>
        val tmp = s"${dir}_tmp"
        chunked.filter($"chunk" === i).select($"doc_id", $"term")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        EventStreams.promoteChunk(tmp, dir, i, ".parquet")
      }
    } finally chunked.unpersist()
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema("doc_id BIGINT, term STRING")
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .as[StreamQueries.TokenRow]
      val got = runToMemory(
        StreamQueries.minhashSignaturesTws(stream).toDF(),
        "st19_out", "update")
      // The staging must actually split docs across batches, or the
      // incremental-merge claim is vacuous.
      assert(got.groupBy($"doc_id").count().agg(max($"count"))
          .head().getLong(0) >= 2,
        "st19 staging never split a doc across micro-batches")
      val fin = got.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"doc_id").orderBy($"n_terms".desc)))
        .filter($"rn" === 1)
        .select($"doc_id", $"m1", $"m2", $"m3", $"m4",
          $"m5", $"m6", $"m7", $"m8",
          $"band1", $"band2", $"band3", $"band4")
      val want = graft.api.TextDedup.minhashSignatures(
        graft.operators.TextBlocking.tokens(spark, sf))
      assertSameRows(fin, want, "st19 streaming state vs batch signatures")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("st12: event-time-timeout offline alerts fire for every drained user") {
    // Sentinel pushes the final watermark ~47h past the last real
    // event — > the 2h offline threshold for every real user, so each
    // must emit exactly one alert carrying its final state. The
    // sentinel user itself (-1) never times out (watermark stops 1h
    // before it) and must be absent.
    val stream = EventStreams.readEventStream(
      spark, replayDir("st12", sentinel = true))
    val got = runToMemory(
      StreamQueries.offlineAlerts(
        stream.as[StreamQueries.EventRow]).toDF(),
      "st12_out", "append")
    assertSameRows(got,
      StreamQueries.offlineAlertsBatch(batchEvents), "st12")
  }

  test("st8: stream-static join == batch join") {
    val stream = EventStreams.readEventStream(
      spark, replayDir("st8", sentinel = false))
    val got = runToMemory(
      StreamQueries.enrichWithUserDim(stream, spark, sf),
      "st8_out", "append")
    assertSameRows(got,
      StreamQueries.enrichWithUserDim(batchEvents, spark, sf), "st8")
  }

  test("st16: stream-stream LEFT OUTER interval join == batch join") {
    // The generic wmflush sentinel does NOT work here: Catalyst pushes
    // the per-type filters below the EventTimeWatermark node (into the
    // scan), so a sentinel of a type neither side keeps never reaches
    // either watermark tracker — and the clicks side then pins the
    // GLOBAL watermark at max-click-ts − 1h forever (measured: the last
    // ~2h of purchases never evict, their null rows never emit). This
    // is the streaming-join twin of Kafka's idle-partition stall: the
    // watermark is per-JOIN-SIDE, so each side's flush row must pass
    // that side's own filter. Hence two TYPED far-future sentinels on
    // reserved negative user ids (distinct ids so they cannot match
    // each other), plus one more click file because outer-state
    // eviction runs in the batch AFTER the watermark advances.
    val dir = replayDir("st16", sentinel = false)
    val maxTs = batchEvents.agg(max($"ts")).head().getTimestamp(0)
    def far(h: Long) =
      new java.sql.Timestamp(maxTs.getTime + h * 3600 * 1000)
    Seq((Long.MaxValue - 1, far(48), -1L, "click", 0.0, "{}"),
        (Long.MaxValue - 2, far(48), -2L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((Long.MaxValue - 3, far(50), -1L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = EventStreams.readEventStream(spark, dir)
    // The purchase sentinel itself can never evict (the watermark
    // stops 1h behind it), so it is excluded by its reserved id; the
    // batch side runs on the ORIGINAL events only.
    val got = runToMemory(StreamQueries.purchaseClickLeftJoin(stream),
      "st16_out", "append").filter($"user_id" >= 0)
    val want = StreamQueries.purchaseClickLeftJoin(batchEvents)
    assertSameRows(got, want, "st16")
    // The outer join must actually exercise the null path: the
    // fixture contains purchases with no in-window click.
    assert(want.filter($"c_id".isNull).count() > 0,
      "fixture must contain unmatched purchases")
  }

  test("st9: stream-stream interval join == batch join") {
    val stream = EventStreams.readEventStream(
      spark, replayDir("st9", sentinel = false))
    val got = runToMemory(StreamQueries.purchaseClickJoin(stream),
      "st9_out", "append")
    assertSameRows(got, StreamQueries.purchaseClickJoin(batchEvents),
      "st9")
  }

  test("st10: checkpointed partitioned parquet sink is exactly-once") {
    val dir = replayDir("st10", sentinel = true)
    val out = scratch("st10_out")
    val chk = scratch("st10_chk")
    def runOnce(): Unit = EventStreams.runToCompletion(
      EventStreams.parquetSink(
        StreamQueries.tumblingWatermarked(
          EventStreams.readEventStream(spark, dir)),
        out, chk).partitionBy("event_type"))
    runOnce()
    val first = spark.read.parquet(out)
    // Partitioned read-back moves event_type to the end; realign.
    val cols = Seq("ws", "event_type", "n", "sum_v").map(col)
    assertSameRows(first.select(cols: _*),
      StreamQueries.tumbling(batchEvents), "st10 first run")
    // Restart on the same checkpoint with no new input: the commit log
    // must prevent any re-emission.
    runOnce()
    val second = spark.read.parquet(out)
    assertSameRows(second.select(cols: _*),
      StreamQueries.tumbling(batchEvents), "st10 after restart")
  }

  test("st10b: checkpoint recovery — restart picks up NEW files exactly once") {
    val dir = scratch("replay_st10b")
    val out = scratch("st10b_out")
    val chk = scratch("st10b_chk")
    import org.apache.spark.sql.functions.{max => fmax}
    val ev = batchEvents.orderBy($"ts", $"event_id")
    val half = (ev.count() / 2).toInt
    def sentinelFile(): Unit = {
      val maxTs = batchEvents.agg(fmax($"ts")).head().getTimestamp(0)
      val far = new java.sql.Timestamp(maxTs.getTime + 48L * 3600 * 1000)
      Seq((Long.MaxValue, far, -1L, "wmflush", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    def runOnce(): Unit = EventStreams.runToCompletion(
      EventStreams.parquetSink(
        StreamQueries.tumblingWatermarked(
          EventStreams.readEventStream(spark, dir)),
        out, chk))
    // First run: only the first half of the events.
    ev.limit(half).coalesce(1).write.mode("append").parquet(dir)
    runOnce()
    val afterFirst = spark.read.parquet(out).count()
    // Second run, SAME checkpoint: the rest + watermark sentinel.
    ev.exceptAll(ev.limit(half)).coalesce(1)
      .write.mode("append").parquet(dir)
    sentinelFile()
    runOnce()
    val cols = Seq("ws", "event_type", "n", "sum_v").map(col)
    assertSameRows(spark.read.parquet(out).select(cols: _*),
      StreamQueries.tumbling(batchEvents), "st10b recovered total")
    assert(afterFirst < spark.read.parquet(out).count(),
      "second run emitted nothing")
  }

  test("st11: foreachBatch upsert target == batch latest-per-user") {
    val target = scratch("st11_target")
    val stream = EventStreams.readEventStream(
      spark, replayDir("st11", sentinel = false))
    val q = StreamQueries.foreachBatchUpsert(stream, target)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(target)
    val want = batchEvents
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"event_id".desc)))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
    assertSameRows(got, want, "st11")
  }

  test("st22: streaming SCD2 change rows == batch dim_scd2 history") {
    // Continuous dimension maintenance: the per-user (tier, version)
    // processor's emitted change stream must equal the DuckDB-oracled
    // batch SCD2 build row-for-row on (user, version, tier,
    // valid_from) — valid_to/is_current are the deterministic lead()
    // view over exactly these rows. Staging: purchases sorted by
    // (ts, event_id) into 5 TIME-CONTIGUOUS chunks, so arrival order
    // honors the processor's event-time contract while every user's
    // history spans many micro-batches (state genuinely carries
    // across batches).
    val dir = scratch("replay_st22")
    val tieredTs = Tables.load(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id",
        when($"value" < 100, "low").when($"value" < 500, "mid")
          .otherwise("high").as("tier"))
    val tiered = tieredTs
      .select($"user_id", expr("unix_micros(ts)").as("ts_us"),
        $"event_id", $"tier")
    val rows = tiered.count()
    val per = math.max(1L, (rows + 4) / 5)
    val chunked = tiered.orderBy($"ts_us", $"event_id").coalesce(1)
      .withColumn("chunk",
        (monotonically_increasing_id() / per).cast("int"))
      .cache()
    try {
      (0 to 4).foreach { i =>
        val tmp = s"${dir}_tmp"
        chunked.filter($"chunk" === i)
          .select($"user_id", $"ts_us", $"event_id", $"tier")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        EventStreams.promoteChunk(tmp, dir, i, ".parquet")
      }
    } finally chunked.unpersist()
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema("user_id BIGINT, ts_us BIGINT, event_id BIGINT, " +
          "tier STRING")
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .as[StreamQueries.TierRow]
      val got = runToMemory(StreamQueries.scd2Tws(stream).toDF(),
        "st22_out", "update")
      val want = graft.api.Warehouse.scd2(tieredTs,
          "user_id", "ts", "event_id", "tier")
        .select($"user_id", $"version", $"tier", $"valid_from")
      assertSameRows(got, want, "st22 streaming scd2 vs batch history")
      // Non-vacuity: histories genuinely evolve (versions beyond 1)
      // and the time-chunked staging spreads a user's changes across
      // batches by construction.
      assert(got.filter($"version" >= 2).count() > 0,
        "no tier ever changed — the change-detection path is vacuous")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  /** st23 shared staging: the st22 tier rows with a caller-chosen
    * CONTENT→REPLAY-POSITION shuffle, plus a far-future sentinel row
    * (user -1) whose only job is to push the final watermark past
    * every real event so the buffered tails flush. Returns (replay
    * dir, batch-want frame, delay string). `order(i)` = which
    * time-contiguous content chunk replays at position i; `delayUs`
    * computed by the caller from the staged chunk spans. */
  private def stageSt23(name: String, order: Seq[Int],
      delayOf: Seq[(Long, Long)] => Long): (String, DataFrame, String) = {
    val dir = scratch(s"replay_$name")
    val tieredTs = Tables.load(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id",
        when($"value" < 100, "low").when($"value" < 500, "mid")
          .otherwise("high").as("tier"))
    val tiered = tieredTs
      .select($"user_id", expr("unix_micros(ts)").as("ts_us"),
        $"event_id", $"tier")
    val rows = tiered.count()
    val per = math.max(1L, (rows + order.length - 1) / order.length)
    val chunked = tiered.orderBy($"ts_us", $"event_id").coalesce(1)
      .withColumn("chunk",
        (monotonically_increasing_id() / per).cast("int"))
      .cache()
    try {
      // (min, max) event time per content chunk, for the delay bound
      val spans = (0 until order.length).map { c =>
        val r = chunked.filter($"chunk" === c)
          .agg(min($"ts_us"), max($"ts_us")).head()
        (r.getLong(0), r.getLong(1))
      }
      val delayUs = delayOf(spans)
      order.zipWithIndex.foreach { case (content, pos) =>
        val tmp = s"${dir}_tmp"
        chunked.filter($"chunk" === content)
          .select($"user_id", $"ts_us", $"event_id", $"tier")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        EventStreams.promoteChunk(tmp, dir, pos, ".parquet")
      }
      val maxUs = spans.map(_._2).max
      val sentinelUs = maxUs + delayUs + 60000000L
      val tmp = s"${dir}_tmp"
      Seq((-1L, sentinelUs, 0L, "low"))
        .toDF("user_id", "ts_us", "event_id", "tier")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      EventStreams.promoteChunk(tmp, dir, order.length, ".parquet")
      val want = graft.api.Warehouse.scd2(tieredTs,
          "user_id", "ts", "event_id", "tier")
        .select($"user_id", $"version", $"tier", $"valid_from")
      (dir, want, s"${delayUs / 1000000 + 1} seconds")
    } finally chunked.unpersist()
  }

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(key, p)
      case None => spark.conf.unset(key)
    }
  }

  private def st23Stream(dir: String) = spark.readStream
    .schema("user_id BIGINT, ts_us BIGINT, event_id BIGINT, tier STRING")
    .option("maxFilesPerTrigger", 1).parquet(dir)
    .withColumn("ts", timestamp_micros($"ts_us"))
    .as[StreamQueries.TierRowW]

  test("st23: buffered SCD2 == batch history under swapped-chunk " +
      "replay (incremental drains)") {
    // Content chunks replayed 0,2,1,4,3 — bounded displacement, so a
    // delay of max(max(c2)−min(c1), max(c4)−min(c3)) covers it and the
    // watermark advances THROUGH the data: chunk 0 finalizes while 3
    // and 4 are still in flight (incremental drains, not one final
    // flush). st22's in-order contract rejects exactly this replay —
    // asserted below, so the case provably needs the buffered op.
    val (dir, want, delay) = stageSt23("st23a", Seq(0, 2, 1, 4, 3),
      spans => math.max(spans(2)._2 - spans(1)._1,
        spans(4)._2 - spans(3)._1))
    withRocksDb {
      val got = runToMemory(
        StreamQueries.scd2TwsBuffered(st23Stream(dir), delay).toDF(),
        "st23a_out", "update").filter($"user_id" >= 0)
      assertSameRows(got, want, "st23a buffered scd2 vs batch history")
      assert(got.filter($"version" >= 2).count() > 0,
        "no tier ever changed — the change-detection path is vacuous")
      // Non-vacuity of the reorder: the same replay must violate
      // st22's event-time-order contract loudly.
      val ex = intercept[org.apache.spark.sql.streaming
          .StreamingQueryException] {
        runToMemory(StreamQueries.scd2Tws(
          st23Stream(dir).map(r => StreamQueries.TierRow(
            r.user_id, r.ts_us, r.event_id, r.tier))).toDF(),
          "st23a_reject", "update")
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
          String.valueOf(c.getMessage).contains("st22: out-of-order")),
        s"expected st22's out-of-order rejection, got: ${ex.getMessage}")
    }
  }

  test("st23: buffered SCD2 == batch history under arbitrary " +
      "event-id-sharded replay (full-span delay)") {
    // Chunk = event_id % 5: arrival order carries NO event-time
    // structure at all, so only a delay covering the full span is
    // sound — the watermark sits below every row until the sentinel,
    // then the no-data batch fires each key's timer and the entire
    // history drains through the sorted transition in one flush. The
    // degenerate-but-legal extreme of the bounded-lateness contract.
    val dir = scratch("replay_st23b")
    val tieredTs = Tables.load(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id",
        when($"value" < 100, "low").when($"value" < 500, "mid")
          .otherwise("high").as("tier"))
    val tiered = tieredTs
      .select($"user_id", expr("unix_micros(ts)").as("ts_us"),
        $"event_id", $"tier").cache()
    try {
      val mm = tiered.agg(min($"ts_us"), max($"ts_us")).head()
      val (minUs, maxUs) = (mm.getLong(0), mm.getLong(1))
      val delayUs = maxUs - minUs + 1000000L
      (0 to 4).foreach { i =>
        val tmp = s"${dir}_tmp"
        tiered.filter(pmod($"event_id", lit(5)) === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        EventStreams.promoteChunk(tmp, dir, i, ".parquet")
      }
      val tmp = s"${dir}_tmp"
      Seq((-1L, maxUs + delayUs + 60000000L, 0L, "low"))
        .toDF("user_id", "ts_us", "event_id", "tier")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      EventStreams.promoteChunk(tmp, dir, 5, ".parquet")
      val want = graft.api.Warehouse.scd2(tieredTs,
          "user_id", "ts", "event_id", "tier")
        .select($"user_id", $"version", $"tier", $"valid_from")
      withRocksDb {
        val got = runToMemory(StreamQueries.scd2TwsBuffered(
            st23Stream(dir), s"${delayUs / 1000000 + 1} seconds").toDF(),
          "st23b_out", "update").filter($"user_id" >= 0)
        assertSameRows(got, want, "st23b buffered scd2 vs batch history")
      }
    } finally tiered.unpersist()
  }

  test("st20: streaming sharded reservoir == batch sample_reservoir") {
    // The sampling family's streaming twin: per-shard k-min hash-rank
    // state maintained incrementally must union-merge to EXACTLY the
    // batch sample_reservoir rows (which DuckDB hash-verifies). Docs
    // are staged hash-ordered so each shard's winners scatter across
    // the 5 replay chunks and the cross-batch min-merge is exercised.
    val dir = scratch("replay_st20")
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("hk", expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)" +
          " AS BIGINT)"))
      .select($"doc_id", $"hk", $"lang", $"source", $"n_chars")
      .orderBy($"hk")
    val rows = docs.count()
    val per = math.max(1L, (rows + 4) / 5)
    val chunked = docs.coalesce(1)
      .withColumn("chunk", (monotonically_increasing_id() / per).cast("int"))
      .cache()
    try {
      (0 to 4).foreach { i =>
        val tmp = s"${dir}_tmp"
        chunked.filter($"chunk" === i)
          .select($"doc_id", $"hk", $"lang", $"source", $"n_chars")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        EventStreams.promoteChunk(tmp, dir, i, ".parquet")
      }
    } finally chunked.unpersist()
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema("doc_id BIGINT, hk BIGINT, lang STRING, source STRING," +
          " n_chars BIGINT")
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .as[StreamQueries.DocSampleRow]
      val got = runToMemory(
        StreamQueries.reservoirTws(stream).toDF(), "st20_out", "update")
      // Per-shard arrivals must span micro-batches or the incremental
      // merge claim is vacuous (n strictly increases per shard).
      assert(got.select($"shard", $"n").distinct()
          .groupBy($"shard").count().agg(max($"count")).head().getLong(0)
          >= 2, "st20 staging never split a shard across micro-batches")
      // Final state per shard (max n), union, global top-100.
      val fin = got.withColumn("mx",
          max($"n").over(org.apache.spark.sql.expressions.Window
            .partitionBy($"shard")))
        .filter($"n" === $"mx")
        .select($"doc_id", $"hk", $"lang", $"source", $"n_chars")
        .distinct()
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy($"hk", $"doc_id")).cast("long"))
        .filter($"rk" <= 100)
        .select($"rk", $"doc_id", $"lang", $"source", $"n_chars")
      val want = graft.SparkEntry.queries("sample_reservoir")(spark, sf)
      assertSameRows(fin, want, "st20 streaming reservoir vs batch")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("st21: bounded-state streaming leaderboard == batch top-k") {
    // Monotone-metric top-k with O(k) state and eviction (see
    // LeaderboardProcessor's exactness argument): per-event-type top-3
    // users by MAX event value in exact cents. Replayed
    // chronologically in 5 chunks so early leaders are admitted and
    // later displaced — the eviction path is asserted non-vacuous.
    val dir = scratch("replay_st21")
    val ev = Tables.load(spark, sf, "events")
      .orderBy($"ts", $"event_id")
      .selectExpr("event_type", "user_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
    val per = math.max(1L, (ev.count() + 4) / 5)
    val chunked = ev.coalesce(1)
      .withColumn("chunk", (monotonically_increasing_id() / per).cast("int"))
      .cache()
    try {
      (0 to 4).foreach { i =>
        val tmp = s"${dir}_tmp"
        chunked.filter($"chunk" === i)
          .select($"event_type", $"user_id", $"cents")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        EventStreams.promoteChunk(tmp, dir, i, ".parquet")
      }
    } finally chunked.unpersist()
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema("event_type STRING, user_id BIGINT, cents BIGINT")
        .option("maxFilesPerTrigger", 1).parquet(dir)
        .as[StreamQueries.LeaderRow]
      val got = runToMemory(
        StreamQueries.leaderboardTws(stream).toDF(), "st21_out", "update")
      // Groups must span micro-batches (n strictly increases per type).
      assert(got.select($"event_type", $"n").distinct()
          .groupBy($"event_type").count()
          .agg(max($"count")).head().getLong(0) >= 2,
        "st21 staging never split a group across micro-batches")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type")
      val fin = got.withColumn("mx", max($"n").over(w))
        .filter($"n" === $"mx")
        .select($"event_type", $"user_id", $"cents")
      // Eviction non-vacuity: some user emitted in an intermediate
      // top-k never made the final board. (Materialized to break the
      // self-join lineage with `got`.)
      val finKeys = fin.select($"event_type", $"user_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      val evicted = got.select($"event_type", $"user_id").distinct()
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .count(!finKeys.contains(_))
      assert(evicted > 0, "no eviction ever happened — bounded-state " +
        "claim untested by this staging")
      // Batch twin: exact-cents max per (type, user), top-3 per type
      // with the same total tie order.
      val want = Tables.load(spark, sf, "events")
        .selectExpr("event_type", "user_id",
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
        .groupBy($"event_type", $"user_id")
        .agg(max($"cents").as("cents"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"event_type")
            .orderBy($"cents".desc, $"user_id")))
        .filter($"rk" <= 3)
        .select($"event_type", $"user_id", $"cents")
      assertSameRows(fin, want, "st21 streaming leaderboard vs batch")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("st24: chained stateful ops — dedup-within-watermark feeding " +
       "a windowed agg == batch") {
    // At-least-once ingestion in ONE query (two stateful operators):
    // each time-ordered chunk is followed by a REPLAY file repeating
    // its tail (ts within 30 min of the chunk max, so when the replay
    // file becomes its own micro-batch the duplicates are provably
    // NOT late — the watermark sits 1h behind the chunk max — and
    // must be dropped by the dedup STATE, or the downstream counts
    // inflate and the equivalence fails).
    val dir = scratch("replay_st24")
    val ev = batchEvents.orderBy($"ts", $"event_id")
    val chunked = ev.coalesce(1)
      .withColumn("rn", monotonically_increasing_id()).cache()
    var staged = 0L
    try {
      val rows = chunked.count()
      val per = math.max(1L, (rows + 3) / 4)
      var idx = 0
      (0 until 4).foreach { i =>
        val chunk = chunked
          .filter($"rn" >= i * per && $"rn" < (i + 1) * per)
        val tmp = s"${dir}_tmp"
        chunk.drop("rn").coalesce(1).write.mode("overwrite").parquet(tmp)
        EventStreams.promoteChunk(tmp, dir, idx, ".parquet"); idx += 1
        val mxTs = chunk.agg(max($"ts")).head().getTimestamp(0)
        val dups = chunk.filter($"ts" >= new java.sql.Timestamp(
          mxTs.getTime - 30L * 60 * 1000)).drop("rn")
        staged += dups.count()
        dups.coalesce(1).write.mode("overwrite").parquet(tmp)
        EventStreams.promoteChunk(tmp, dir, idx, ".parquet"); idx += 1
      }
      // Watermark-flush sentinel so every real window emits in append.
      val maxTs = batchEvents.agg(max($"ts")).head().getTimestamp(0)
      val far = new java.sql.Timestamp(maxTs.getTime + 48L * 3600 * 1000)
      val tmp = s"${dir}_tmp"
      Seq((Long.MaxValue, far, -1L, "wmflush", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      EventStreams.promoteChunk(tmp, dir, idx, ".parquet")
    } finally chunked.unpersist()
    assert(staged > 0, "st24 staging produced no duplicates")
    val stream = EventStreams.readEventStream(spark, dir)
    val got = runToMemory(StreamQueries.dedupThenTumbling(stream),
      "st24_out", "append")
    // == batch over the ORIGINAL events: every duplicate state-dropped
    // (or late-dropped), the sentinel's own window never emitted.
    assertSameRows(got, StreamQueries.dedupThenTumbling(batchEvents),
      "st24 chained dedup+agg vs batch")
    // Non-vacuous chain: BOTH stateful operators ran in one query.
    assert(lastStateOps.size == 2,
      s"st24 expected 2 stateful operators, saw $lastStateOps")
  }

  test("st26: stream-stream join chained into a windowed agg == batch") {
    // The second multi-stateful combination (st24 = dedup -> agg):
    // the watermarked purchase x click interval join feeding an
    // hourly attribution rollup in ONE query. The wmflush sentinel
    // advances the watermark so the join's last matches AND the
    // final windows both flush before the query stops; the
    // sentinel's own window never emits (watermark stops 1h short),
    // and its event_type matches neither join side, so the batch
    // twin over the ORIGINAL events is the exact expectation.
    val stream = EventStreams.readEventStream(
      spark, replayDir("st26", sentinel = true))
    val got = runToMemory(StreamQueries.joinThenTumbling(stream),
      "st26_out", "append")
    assert(got.count() > 0, "st26 emitted nothing")
    assertSameRows(got, StreamQueries.joinThenTumbling(batchEvents),
      "st26 chained join+agg vs batch")
    // Non-vacuous chain: join AND aggregation both carried state.
    assert(lastStateOps.size == 2,
      s"st26 expected 2 stateful operators, saw $lastStateOps")
  }

  test("st11b: re-delivered micro-batches leave the upsert target " +
       "unchanged (foreachBatch idempotence)") {
    // st11 asserts convergence; THIS is the exactly-once claim a
    // foreachBatch implementation must earn (r16 verdict item 8): a
    // sink-side retry re-delivers a batch the merge already consumed
    // — after a crash between the sink write and the offset-log
    // commit — and the target must not change. Re-delivering the
    // LATEST batch (the real retry case) and a STALE batch (an
    // operator manually re-running an old range) must both be
    // no-ops: keep-max-event_id-per-user is idempotent AND monotone,
    // so merged state can only be confirmed, never regressed.
    val target = scratch("st11b_target")
    val ev = batchEvents.orderBy($"ts", $"event_id")
    val b1 = ev.limit(300)
    val b2 = ev.limit(600).exceptAll(b1)
    StreamQueries.upsertLatest(b1, target)
    StreamQueries.upsertLatest(b2, target)
    def snap(): Seq[String] =
      spark.read.parquet(target).collect().map(_.toString).sorted.toSeq
    val committed = snap()
    StreamQueries.upsertLatest(b2, target) // retry of the last batch
    assert(snap() == committed,
      "re-delivering the latest batch changed the target")
    StreamQueries.upsertLatest(b1, target) // stale re-delivery
    assert(snap() == committed,
      "re-delivering a stale batch regressed the target")
  }

  test("st27: MapState TTL — post-gap resume restarts from zero " +
       "while the TTL-free control accumulates (same replay)") {
    // The feature-store eviction law (r16 verdict item 5): two
    // checkpoints replay the IDENTICAL two-phase file stream — phase
    // 1, a quiet gap longer than the TTL, phase 2 — one query with a
    // 4 s state TTL, one with TTLConfig.NONE. The TTL query's
    // post-gap snapshots must equal the batch aggregate over PHASE 2
    // ALONE (every phase-1 entry and counter expired in the gap);
    // the control must equal the cumulative aggregate. Same data,
    // same arrival order — the TTL is the only difference. Phase 2
    // replays as ONE micro-batch (only the new file), so the TTL
    // query cannot expire its own writes regardless of wall-clock
    // noise (expiry compares against the single batch timestamp).
    //
    // LOAD-BEARING invariant (r17 ADVICE): the one-file-one-batch
    // shape above is what makes this test immune to co-tenant load
    // bursts — the only wall-clock-sensitive edge is the gap sleep,
    // which only needs to be LONGER than the TTL (delay can never
    // un-expire state). Any future change that splits a phase into
    // multiple micro-batches, or shortens gap/TTL margins, reopens
    // the flake window; widen ttlMs with the phase count.
    val ttlMs = 4000L
    withRocksDb {
      val dir = scratch("replay_st27")
      val ev = batchEvents.orderBy($"ts", $"event_id")
      val rows = ev.count()
      val chunked = ev.coalesce(1)
        .withColumn("rn", monotonically_increasing_id()).cache()
      try {
        val phase2Start = rows / 2
        def stage(lo: Long, hi: Long, pos: Int): Unit = {
          val tmp = s"${dir}_tmp"
          chunked.filter($"rn" >= lo && $"rn" < hi).drop("rn")
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          EventStreams.promoteChunk(tmp, dir, pos, ".parquet")
        }
        val chkT = scratch("st27_chk_ttl")
        val chkC = scratch("st27_chk_ctl")
        // foreachBatch parquet sink (batchId-named subdirs, the st25
        // idempotence discipline): the memory sink cannot RESUME from
        // a checkpoint, and run 2 on the same checkpoint is the whole
        // point of this test.
        def run(name: String, chk: String, ttl: Boolean): DataFrame = {
          val outDir = scratch(s"out_$name")
          val stream = spark.readStream.schema(Tables.events)
            .parquet(dir).as[StreamQueries.EventRow]
          val out =
            if (ttl) StreamQueries.userTypeMapTtlTws(stream, ttlMs)
            else StreamQueries.userTypeMapTws(stream)
          val q = out.toDF().writeStream.outputMode("update")
            .option("checkpointLocation", chk)
            .foreachBatch { (b: DataFrame, bid: Long) =>
              b.write.mode("overwrite").parquet(s"$outDir/batch=$bid")
            }
            .trigger(Trigger.AvailableNow()).start()
          def emitted: DataFrame = spark.read.parquet(outDir)
            .drop("batch")
          if (ttl) {
            // ProcessingTime TimeMode keeps AvailableNow alive forever
            // (shouldRunAnotherBatch is unconditionally true for
            // processing-time state, to service timers/TTL), so the
            // TTL runs poll for the single data batch — each phase is
            // ONE file, and foreachBatch commits it atomically — then
            // stop. TTL cleanup runs INSIDE the data batch, so the
            // committed state is post-sweep.
            val deadline = System.currentTimeMillis() + 120000
            def gotData: Boolean =
              scala.util.Try(emitted.count()).getOrElse(0L) > 0
            while (System.currentTimeMillis() < deadline && !gotData)
              Thread.sleep(100)
            assert(gotData, s"$name: no data batch committed within 120s")
            q.stop()
          }
          q.awaitTermination()
          emitted
        }
        stage(0, phase2Start, 0)
        run("st27_t1", chkT, ttl = true)
        run("st27_c1", chkC, ttl = false)
        Thread.sleep(ttlMs + 2500) // the quiet gap: > TTL by margin
        stage(phase2Start, rows, 1)
        val gotT = run("st27_t2", chkT, ttl = true)
        val gotC = run("st27_c2", chkC, ttl = false)
        def finalSnap(df: DataFrame): DataFrame = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id")
          df.withColumn("mx", max($"total_n").over(w))
            .filter($"total_n" === $"mx")
            .select($"user_id", $"event_type", $"n", $"sum_cents")
        }
        val phase2 = chunked.filter($"rn" >= phase2Start).drop("rn")
        val phase2Users = phase2.select($"user_id").distinct()
        val wantT = StreamQueries.userTypeBatch(phase2)
        val wantC = StreamQueries.userTypeBatch(batchEvents)
          .join(phase2Users, Seq("user_id"))
        // Non-vacuity: the two expectations genuinely differ (users
        // carry phase-1 history the TTL must have erased).
        assert(wantT.exceptAll(wantC).count() > 0,
          "phase split degenerate: TTL and control expectations equal")
        assertSameRows(finalSnap(gotT), wantT,
          "st27 TTL state vs phase-2-only batch aggregate")
        assertSameRows(finalSnap(gotC), wantC,
          "st27 control state vs cumulative batch aggregate")
        // Physical eviction, not read-side filtering: the statestore
        // reader over the TTL checkpoint holds exactly the phase-2
        // (user, type) entries — expired rows were swept by the
        // per-batch TTL cleanup.
        val raw = spark.read.format("statestore")
          .option("stateVarName", "types").load(chkT)
        val flat = raw.selectExpr("key.*", "user_map_key.*")
        val stateKeys = flat.collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        val wantKeys = phase2.select($"user_id", $"event_type")
          .distinct().collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        assert(stateKeys == wantKeys,
          s"TTL state not swept to phase-2 entries: " +
            s"extra=${(stateKeys -- wantKeys).take(5)} " +
            s"missing=${(wantKeys -- stateKeys).take(5)}")
      } finally chunked.unpersist()
    }
  }

  test("st28: streaming LSH bucket inserts — final ListState " +
       "set-equal to the oracled batch bucket relation") {
    // The "training-free index serves streaming inserts" claim
    // closed end-to-end (r16 verdict item 6): embeddings replayed in
    // 5 micro-batches, hashed map-side by the SAME shared fold the
    // oracled vec_lsh/vec_lsh_table keys use, appended to per-bucket
    // ListState. The final state must be SET-EQUAL to the batch
    // bucket relation — which vec_lsh's DuckDB oracle transitively
    // pins — under an arrival order the fold provably cannot see.
    graft.functions.VectorExpressions.register(spark)
    withRocksDb {
      val dir = scratch("replay_st28")
      val emb = Tables.load(spark, sf, "embeddings")
        .select($"vec_id", $"embedding")
      val rows = emb.count()
      val per = math.max(1L, (rows + 4) / 5)
      val chunked = emb.orderBy($"vec_id").coalesce(1)
        .withColumn("chunk",
          (monotonically_increasing_id() / per).cast("int")).cache()
      try {
        (0 to 4).foreach { i =>
          val tmp = s"${dir}_tmp"
          chunked.filter($"chunk" === i).select($"vec_id", $"embedding")
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          EventStreams.promoteChunk(tmp, dir, i, ".parquet")
        }
      } finally chunked.unpersist()
      val chk = scratch("st28_chk")
      val stream = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val inserts = graft.operators.LlmQueries.lshBuckets(stream)
        .as[StreamQueries.LshIns]
      val q = StreamQueries.lshBucketsTws(inserts).toDF()
        .writeStream.format("memory").queryName("st28_out")
        .outputMode("update").option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("st28_out")
      // Non-vacuity: buckets genuinely accumulate across batches.
      assert(got.select($"t", $"bkt", $"n").distinct()
          .groupBy($"t", $"bkt").count()
          .agg(max($"count")).head().getLong(0) >= 2,
        "st28 staging never grew a bucket across micro-batches")
      val want = graft.operators.LlmQueries.lshBuckets(
        Tables.load(spark, sf, "embeddings"))
      // Final sizes: max-n per bucket == batch occupancy.
      val finSizes = got.groupBy($"t", $"bkt").agg(max($"n").as("n"))
      assertSameRows(finSizes,
        want.groupBy($"t", $"bkt").agg(count(lit(1)).as("n")),
        "st28 final bucket sizes vs batch")
      // The index itself: ListState members == batch member relation.
      val raw = spark.read.format("statestore")
        .option("stateVarName", "members").load(chk)
      // Primitive-encoder state values come back wrapped in a
      // single-field struct — flatten both the tuple key and the
      // list element.
      val flat = raw.selectExpr("key.*", "list_element.*")
      val stateRows = flat.collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val wantRows = want.collect()
        .map(r => (r.getInt(1), r.getLong(2), r.getLong(0))).toSet
      assert(stateRows == wantRows,
        s"st28 state != batch buckets: extra=" +
          s"${(stateRows -- wantRows).take(5)} missing=" +
          s"${(wantRows -- stateRows).take(5)}")
      // The O(1)-size-emission counter (r17 ADVICE): under
      // TTLConfig.NONE the `occ` ValueState must equal the live list
      // occupancy exactly — max-n per bucket was already asserted
      // equal to the batch occupancy above, so here we only pin that
      // the counter state rows exist 1:1 with buckets.
      val occRows = spark.read.format("statestore")
        .option("stateVarName", "occ").load(chk).count()
      assert(occRows == wantRows.map(r => (r._1, r._2)).size,
        s"st28 occ counter rows $occRows != distinct buckets")
    }
  }

  test("st28b: LSH index retention — pre-gap members physically " +
       "swept by ListState TTL, post-gap counter restarts") {
    // The r17 verdict's item 3 (the index state that becomes
    // corpus-sized at 100 TB had no eviction story): same two-phase
    // replay discipline as st27 — phase 1, a quiet gap > TTL, phase 2
    // on the RESUMED checkpoint. ListState TTL is per-element, so the
    // gap expires every phase-1 member; the statestore after phase 2
    // must hold EXACTLY the phase-2 member relation (physically swept
    // by the per-batch TTL cleanup, st27's discipline), and the
    // post-gap size emissions must equal the phase-2-only bucket
    // occupancy (the occ counter expired with its bucket, restarting
    // from zero like a new key).
    //
    // LOAD-BEARING invariant (shared with st27, r17 ADVICE): each
    // phase is ONE staged file and replays as ONE micro-batch, so a
    // phase can never expire its own writes regardless of wall-clock
    // noise — TTL expiry compares against the single batch timestamp.
    // Any future multi-batch phase must widen the TTL/gap margins.
    val ttlMs = 4000L
    graft.functions.VectorExpressions.register(spark)
    withRocksDb {
      val dir = scratch("replay_st28b")
      val emb = Tables.load(spark, sf, "embeddings")
        .select($"vec_id", $"embedding")
      val rows = emb.count()
      val half = rows / 2
      val chunked = emb.orderBy($"vec_id").coalesce(1)
        .withColumn("rn", monotonically_increasing_id()).cache()
      try {
        def stage(lo: Long, hi: Long, pos: Int): Unit = {
          val tmp = s"${dir}_tmp"
          chunked.filter($"rn" >= lo && $"rn" < hi)
            .select($"vec_id", $"embedding")
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          EventStreams.promoteChunk(tmp, dir, pos, ".parquet")
        }
        val chk = scratch("st28b_chk")
        def run(name: String): DataFrame = {
          val outDir = scratch(s"out_$name")
          val stream = spark.readStream
            .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
            .parquet(dir)
          val inserts = graft.operators.LlmQueries.lshBuckets(stream)
            .as[StreamQueries.LshIns]
          val q = StreamQueries.lshBucketsTtlTws(inserts, ttlMs).toDF()
            .writeStream.outputMode("update")
            .option("checkpointLocation", chk)
            .foreachBatch { (b: DataFrame, bid: Long) =>
              b.write.mode("overwrite").parquet(s"$outDir/batch=$bid")
            }
            .trigger(Trigger.AvailableNow()).start()
          // ProcessingTime TimeMode keeps AvailableNow alive forever
          // (st27's finding) — poll for the single data batch, stop.
          val deadline = System.currentTimeMillis() + 120000
          def emitted: DataFrame = spark.read.parquet(outDir).drop("batch")
          def gotData: Boolean =
            scala.util.Try(emitted.count()).getOrElse(0L) > 0
          while (System.currentTimeMillis() < deadline && !gotData)
            Thread.sleep(100)
          assert(gotData, s"$name: no data batch committed within 120s")
          q.stop(); q.awaitTermination()
          emitted
        }
        stage(0, half, 0)
        run("st28b_1")
        Thread.sleep(ttlMs + 2500) // quiet gap > TTL by margin
        stage(half, rows, 1)
        val got2 = run("st28b_2")
        def bucketsOf(lo: Long, hi: Long): DataFrame =
          graft.operators.LlmQueries.lshBuckets(
            chunked.filter($"rn" >= lo && $"rn" < hi)
              .select($"vec_id", $"embedding"))
        val phase1 = bucketsOf(0, half)
        val phase2 = bucketsOf(half, rows)
        // Non-vacuity: the sweep is observed on buckets that were
        // genuinely live in phase 1, including some touched again in
        // phase 2 (counter-restart case) and some never touched again
        // (cleanup-without-touch case).
        val b1 = phase1.select($"t", $"bkt").distinct()
        val b2 = phase2.select($"t", $"bkt").distinct()
        assert(b1.join(b2, Seq("t", "bkt")).count() > 0 &&
               b1.join(b2, Seq("t", "bkt"), "left_anti").count() > 0,
          "st28b phase split degenerate: need shared AND phase-1-only buckets")
        // Post-gap emissions == phase-2-only occupancy (counter TTL).
        assertSameRows(
          got2.groupBy($"t", $"bkt").agg(max($"n").as("n")),
          phase2.groupBy($"t", $"bkt").agg(count(lit(1)).as("n")),
          "st28b post-gap sizes vs phase-2-only batch occupancy")
        // Physical sweep: statestore holds exactly phase-2 members.
        val raw = spark.read.format("statestore")
          .option("stateVarName", "members").load(chk)
        // TTL'd list elements come back as struct(value, ttlExpirationMs)
        // where `value` is the usual single-field primitive wrap.
        val flat = raw.selectExpr("key._1 AS t", "key._2 AS bkt",
          "list_element.value.*")
        val stateRows = flat.collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
        val wantRows = phase2.collect()
          .map(r => (r.getInt(1), r.getLong(2), r.getLong(0))).toSet
        assert(stateRows == wantRows,
          s"st28b state not swept to phase-2 members: extra=" +
            s"${(stateRows -- wantRows).take(5)} missing=" +
            s"${(wantRows -- stateRows).take(5)}")
      } finally chunked.unpersist()
    }
  }

  test("st25: MapState feature map (RocksDB) converges to batch " +
       "per-(user, type) aggregate") {
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val stream = EventStreams.readEventStream(
        spark, replayDir("st25", sentinel = false))
      val got = runToMemory(
        StreamQueries.userTypeMapTws(
          stream.as[StreamQueries.EventRow]).toDF(),
        "st25_out", "update")
      // Non-vacuous: some user's map grew across micro-batches.
      assert(got.select($"user_id", $"total_n").distinct()
          .groupBy($"user_id").count()
          .agg(max($"count")).head().getLong(0) >= 2,
        "st25 staging never updated a user across micro-batches")
      // total_n strictly increases per user; its max marks the final
      // full-map snapshot emission.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id")
      val fin = got.withColumn("mx", max($"total_n").over(w))
        .filter($"total_n" === $"mx")
        .select($"user_id", $"event_type", $"n", $"sum_cents")
      assertSameRows(fin, StreamQueries.userTypeBatch(batchEvents),
        "st25 MapState snapshot vs batch")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
