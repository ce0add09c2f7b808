package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** transformWithState at scale (r15 verdict item 4): replay the two
  * hardest custom-state ops over the 100x staging on RocksDB and pin
  * their STATE behavior with measurements, not arguments.
  *
  * - st19 (incremental minhash): state is O(1) per doc by design
  *   (9 longs). Law: the final state read back through the
  *   `statestore` source is row-count-equal to the distinct-doc count
  *   and BIT-EQUAL (except-both-ways) to the batch
  *   `TextDedup.minhashSignatures` relation the DuckDB oracle pins —
  *   at 500k docs / ~75M streamed tokens, not just the fixture.
  *   Token files need no ordering (elementwise min is commutative/
  *   associative/idempotent), so the staging is one partitioned
  *   write; every doc's tokens still scatter across many files.
  *
  * - st23 (watermark-buffered SCD2): the ListState buffer is claimed
  *   O(rows inside the lateness horizon), NOT O(rows seen). Laws:
  *   (a) emitted change rows == the batch dim_scd2 build
  *   (except-both-ways) on a pair-swapped replay whose disorder the
  *   delay covers; (b) the PER-BATCH state-row series from the
  *   progress listener peaks well below the input size (an unbounded
  *   buffer would ramp to ~input rows and never fall) and returns to
  *   ~#users after the sentinel batch (buffer drained, one Scd2St
  *   value row per user remains).
  *
  * - st25 (MapState feature map, r16): state is claimed O(users x
  *   distinct types per user). Laws: (a) the final full-map snapshot
  *   (max-total_n rows per user) equals the batch (user, type)
  *   aggregate at 10M events; (b) the listener-reported final state
  *   rows land at EXACTLY map entries + one counter row per user —
  *   the arithmetic form of "bounded by key cardinality, not input".
  *
  * - st27 (r18): st25's exact workload through the TTL'd processor
  *   (horizon >> run, so eviction bookkeeping is paid but nothing
  *   expires). Laws: final snapshot == batch aggregate AND the
  *   statestore-source counts land at exactly (user x type) `types`
  *   rows + one `total` row per user — retention must not change the
  *   cardinality story. The row prices TTL next to st25's number.
  *
  * - st28 (r18): the streaming LSH index insert path with eviction
  *   ON — per-element TTL'd ListState + O(1) occupancy counter.
  *   Laws: statestore holds exactly 4 member rows per vector and one
  *   counter row per occupied bucket (== the batch bucket relation's
  *   distinct (t, bkt) count).
  *
  * Output: one JSON line, persisted to SPARK_GRAFT_TWS_OUT (default
  * target/twsbench.json) — elapsed/rows-per-sec per op, the st23
  * per-batch state series, state-dir bytes, and law verdicts. Laws
  * `require` loudly, so a nonzero exit IS a failed audit.
  */
object TwsBench {
  private def dirBytes(p: String): Long = {
    val root = Paths.get(p)
    if (!Files.exists(root)) return -1L
    import scala.jdk.CollectionConverters._
    Files.walk(root).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val work = sys.env.getOrElse("SPARK_GRAFT_TWS_WORK", "/tmp/twsbench")
    val chunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "12").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
    graft.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Per-batch state metrics via the progress listener — the only
    // window into MID-stream state size without a per-batch
    // time-travel read (and the same numbers an operator would watch
    // in production).
    val series = collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    // Cumulative source rows across batches (r18): the TTL'd ops run
    // under TimeMode.ProcessingTime, where AvailableNow never
    // self-terminates (st27 spec finding) — completion is detected by
    // polling this counter against the staged row count, then stop().
    val inputSum = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.sql.streaming
        .StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val total = p.stateOperators.map(_.numRowsTotal).sum
        val upd = p.stateOperators.map(_.numRowsUpdated).sum
        series.synchronized { series += ((p.batchId, total, upd)) }
        inputSum.addAndGet(p.numInputRows)
      }
    }
    spark.streams.addListener(listener)

    /** Run a ProcessingTime-TimeMode AvailableNow query to input
      * exhaustion: poll the listener's cumulative source-row counter
      * up to `expect`, then stop (the query would otherwise spin
      * empty micro-batches forever servicing TTL timers). */
    def runTtlToCompletion(
        q: org.apache.spark.sql.streaming.StreamingQuery,
        expect: Long, label: String): Unit = {
      val deadline = System.currentTimeMillis() + 45 * 60 * 1000L
      while (System.currentTimeMillis() < deadline &&
             inputSum.get() < expect) Thread.sleep(200)
      require(inputSum.get() == expect,
        s"$label: consumed ${inputSum.get()} of $expect staged rows " +
          "within the deadline")
      q.stop(); q.awaitTermination()
    }

    def keyField(df: DataFrame): String =
      df.schema("key").dataType.asInstanceOf[StructType].fieldNames.head

    // ---------------- st19: incremental minhash ----------------
    val tokens = graft.operators.TextBlocking.tokens(spark, sfDir)
    val tokDir = s"$work/tok"
    graft.Util.deleteRecursively(new java.io.File(tokDir))
    // No ordering contract: one partitioned write; ~chunks*4 files so
    // mft=4 yields ~`chunks` micro-batches and docs split across them.
    tokens.repartition(chunks * 4).write.parquet(tokDir)
    val tokRows = spark.read.parquet(tokDir).count()
    val chk19 = s"$work/chk19"
    graft.Util.deleteRecursively(new java.io.File(chk19))
    series.clear()
    val t19 = System.nanoTime()
    EventStreams.runToCompletion(
      StreamQueries.minhashSignaturesTws(
        spark.readStream.schema("doc_id BIGINT, term STRING")
          .option("maxFilesPerTrigger", 4).parquet(tokDir)
          .as[StreamQueries.TokenRow]).toDF()
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", chk19))
    val sec19 = (System.nanoTime() - t19) / 1e9
    val batches19 = series.size
    // Final state == batch signatures, bit-for-bit.
    val raw19 = spark.read.format("statestore")
      .option("stateVarName", "minhash").load(chk19)
    val sig = Seq("m1", "m2", "m3", "m4", "m5", "m6", "m7", "m8")
    val stateSigs = raw19
      .select(col(s"key.${keyField(raw19)}").as("doc_id"),
        col("value.*"))
      .select(($"doc_id" +: sig.map(col)): _*)
    val batchSigs = graft.api.TextDedup.minhashSignatures(tokens)
      .select(($"doc_id" +: sig.map(col)): _*)
    val nState = stateSigs.count()
    val nDocs = tokens.select($"doc_id").distinct().count()
    val d1 = stateSigs.exceptAll(batchSigs).count()
    val d2 = batchSigs.exceptAll(stateSigs).count()
    require(nState == nDocs && d1 == 0 && d2 == 0,
      s"st19 state mismatch: state=$nState docs=$nDocs " +
        s"state\\batch=$d1 batch\\state=$d2")
    val bytes19 = dirBytes(s"$chk19/state")

    // ---------------- st23: watermark-buffered SCD2 ----------------
    val tieredTs = graft.Tables.load(spark, sfDir, "events")
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id",
        when($"value" < 100, "low").when($"value" < 500, "mid")
          .otherwise("high").as("tier"))
    val tiered = tieredTs.select($"user_id",
      expr("unix_micros(ts)").as("ts_us"), $"event_id", $"tier")
    val evDir = s"$work/tier"
    graft.Util.deleteRecursively(new java.io.File(evDir))
    val evRows = tiered.count()
    val per = math.max(1L, (evRows + chunks - 1) / chunks)
    val chunked = tiered.orderBy($"ts_us", $"event_id").coalesce(1)
      .withColumn("chunk",
        (monotonically_increasing_id() / per).cast("int")).cache()
    val spans = chunked.groupBy($"chunk")
      .agg(min($"ts_us").as("lo"), max($"ts_us").as("hi"))
      .orderBy($"chunk")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val nChunks = spans.length
    // Pair-swapped replay order (1,0,3,2,…): bounded displacement the
    // delay covers, and the watermark advances THROUGH the data so
    // the buffer drains incrementally — the horizon-bound regime.
    val order = (0 until nChunks).grouped(2).flatMap(_.reverse).toSeq
    val delayUs = order.grouped(2).collect {
      case Seq(a, b) => spans(a max b)._2 - spans(a min b)._1
    }.max + 1000000L
    order.zipWithIndex.foreach { case (content, pos) =>
      val tmp = s"${evDir}_tmp"
      chunked.filter($"chunk" === content)
        .select($"user_id", $"ts_us", $"event_id", $"tier")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      EventStreams.promoteChunk(tmp, evDir, pos, ".parquet")
    }
    val sentinelUs = spans.map(_._2).max + delayUs + 60000000L
    val tmp = s"${evDir}_tmp"
    Seq((-1L, sentinelUs, 0L, "low"))
      .toDF("user_id", "ts_us", "event_id", "tier")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    EventStreams.promoteChunk(tmp, evDir, nChunks, ".parquet")
    chunked.unpersist()

    val chk23 = s"$work/chk23"
    val out23 = s"$work/out23"
    Seq(chk23, out23).foreach(p =>
      graft.Util.deleteRecursively(new java.io.File(p)))
    series.clear()
    val delay = s"${delayUs / 1000000 + 1} seconds"
    val t23 = System.nanoTime()
    EventStreams.runToCompletion(
      StreamQueries.scd2TwsBuffered(
        spark.readStream
          .schema("user_id BIGINT, ts_us BIGINT, event_id BIGINT, " +
            "tier STRING")
          .option("maxFilesPerTrigger", 1).parquet(evDir)
          .withColumn("ts", timestamp_micros($"ts_us"))
          .as[StreamQueries.TierRowW], delay).toDF()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out23).option("checkpointLocation", chk23))
    val sec23 = (System.nanoTime() - t23) / 1e9
    val series23 = series.toSeq.sortBy(_._1)
    val peak23 = if (series23.isEmpty) -1L else series23.map(_._2).max
    val finalRows23 = if (series23.isEmpty) -1L else series23.last._2
    // Emitted == batch SCD2 history.
    val got = spark.read.parquet(out23).filter($"user_id" >= 0)
      .select($"user_id", $"version", $"tier", $"valid_from")
    val want = graft.api.Warehouse.scd2(tieredTs,
        "user_id", "ts", "event_id", "tier")
      .select($"user_id", $"version", $"tier", $"valid_from")
    val e1 = got.exceptAll(want).count()
    val e2 = want.exceptAll(got).count()
    require(e1 == 0 && e2 == 0,
      s"st23 emitted != batch scd2: got\\want=$e1 want\\got=$e2")
    val nUsers = tiered.select($"user_id").distinct().count()
    // Horizon bound: the pair-swap keeps <= ~4 chunk spans buffered;
    // unbounded buffering would ramp to ~evRows. 0.6 is loose on
    // purpose — the law is "a fraction of the input", the series in
    // the JSON is the exact record.
    require(peak23 > 0 && peak23 < (evRows * 6) / 10,
      s"st23 peak state $peak23 not << input $evRows — " +
        "buffer is not horizon-bounded")
    val bytes23 = dirBytes(s"$chk23/state")

    // ---------------- st25: MapState feature map ----------------
    // State is O(users x distinct types per user) BY DESIGN — the law
    // here is that the listener-reported state rows land at exactly
    // that product (plus the one total-counter value row per user),
    // never at O(input rows), and that the final snapshot equals the
    // batch (user, type) aggregate at 10M events on RocksDB.
    val events25 = graft.Tables.load(spark, sfDir, "events")
    val evDir25 = s"$work/ev25"
    val out25 = s"$work/out25"
    val chk25 = s"$work/chk25"
    Seq(evDir25, out25, chk25).foreach(p =>
      graft.Util.deleteRecursively(new java.io.File(p)))
    // No ordering contract: counts are commutative and total_n is
    // monotone per user under any arrival order — one partitioned
    // write, docs scattered across ~chunks micro-batches at mft=4.
    events25.repartition(chunks * 4).write.parquet(evDir25)
    val evRows25 = spark.read.parquet(evDir25).count()
    series.clear()
    val t25 = System.nanoTime()
    EventStreams.runToCompletion(
      StreamQueries.userTypeMapTws(
        spark.readStream.schema(graft.Tables.events)
          .option("maxFilesPerTrigger", 4).parquet(evDir25)
          .as[StreamQueries.EventRow]).toDF()
        .writeStream.outputMode("update")
        .option("checkpointLocation", chk25)
        // r17 (ADVICE): per-batch OVERWRITE into a batchId-named
        // partition dir, not a blind append — a micro-batch retry
        // rewrites its own directory identically instead of
        // duplicating rows, so the exceptAll law below cannot be
        // spuriously failed by at-least-once redelivery. (This is
        // also the idempotence discipline st11's foreachBatch sink
        // is law-tested for.)
        .foreachBatch { (b: DataFrame, bid: Long) =>
          b.write.mode("overwrite").parquet(s"$out25/batch=$bid")
        })
    val sec25 = (System.nanoTime() - t25) / 1e9
    val series25 = series.toSeq.sortBy(_._1)
    val finalRows25 = if (series25.isEmpty) -1L else series25.last._2
    val batches25 = series25.size
    // Final snapshot (max-total_n rows per user) == batch aggregate.
    val emitted = spark.read.parquet(out25)
    val w25 = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
    val fin25 = emitted.withColumn("mx", max($"total_n").over(w25))
      .filter($"total_n" === $"mx")
      .select($"user_id", $"event_type", $"n", $"sum_cents")
    val want25 = StreamQueries.userTypeBatch(events25)
    val x1 = fin25.exceptAll(want25).count()
    val x2 = want25.exceptAll(fin25).count()
    require(x1 == 0 && x2 == 0,
      s"st25 final snapshot != batch agg: fin\\batch=$x1 batch\\fin=$x2")
    val userTypes = want25.count()
    val nUsers25 = events25.select($"user_id").distinct().count()
    // The state-size law: map entries + one counter row per user.
    require(finalRows25 == userTypes + nUsers25,
      s"st25 state rows $finalRows25 != map entries $userTypes + " +
        s"users $nUsers25 — MapState is not O(users x types)")
    val bytes25 = dirBytes(s"$chk25/state")

    // ---------------- st27: feature map WITH state TTL ----------------
    // st25's exact workload replayed through the TTL'd processor with
    // a retention horizon far beyond the run: the per-entry expiration
    // bookkeeping and the per-batch TTL sweep are PAID on every batch,
    // but nothing expires — so the st25 cardinality law must hold
    // IDENTICALLY (read through the statestore source, the
    // provider-independent count: one `types` row per (user, type),
    // one `total` counter row per user) and the row measures the
    // PRICE of retention next to st25's TTL-free number. Eviction
    // CORRECTNESS (expired rows physically swept) is
    // StreamingEquivalenceSpec st27's law at fixture scale — here the
    // horizon must exceed the run or the law itself becomes timing-
    // dependent, the flake class the spec's design note bans.
    val chk27 = s"$work/chk27"
    val out27 = s"$work/out27"
    Seq(chk27, out27).foreach(p =>
      graft.Util.deleteRecursively(new java.io.File(p)))
    series.clear(); inputSum.set(0L)
    val ttlMs = 3600L * 1000L
    val t27 = System.nanoTime()
    runTtlToCompletion(
      StreamQueries.userTypeMapTtlTws(
        spark.readStream.schema(graft.Tables.events)
          .option("maxFilesPerTrigger", 4).parquet(evDir25)
          .as[StreamQueries.EventRow], ttlMs).toDF()
        .writeStream.outputMode("update")
        .option("checkpointLocation", chk27)
        .foreachBatch { (b: DataFrame, bid: Long) =>
          b.write.mode("overwrite").parquet(s"$out27/batch=$bid")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(),
      evRows25, "st27")
    val sec27 = (System.nanoTime() - t27) / 1e9
    val emitted27 = spark.read.parquet(out27)
    val fin27 = emitted27.withColumn("mx", max($"total_n").over(w25))
      .filter($"total_n" === $"mx")
      .select($"user_id", $"event_type", $"n", $"sum_cents")
    val y1 = fin27.exceptAll(want25).count()
    val y2 = want25.exceptAll(fin27).count()
    require(y1 == 0 && y2 == 0,
      s"st27 final snapshot != batch agg: fin\\batch=$y1 batch\\fin=$y2")
    val typesRows27 = spark.read.format("statestore")
      .option("stateVarName", "types").load(chk27).count()
    val totalRows27 = spark.read.format("statestore")
      .option("stateVarName", "total").load(chk27).count()
    require(typesRows27 == userTypes && totalRows27 == nUsers25,
      s"st27 state rows (types=$typesRows27, total=$totalRows27) != " +
        s"(userTypes=$userTypes, users=$nUsers25) under TTL bookkeeping")
    val bytes27 = dirBytes(s"$chk27/state")

    // ---------------- st28: LSH index inserts, eviction ON ----------
    // The streaming ANN index insert path (st28) at scale with the
    // retention machinery enabled: every arriving embedding hashes
    // map-side into its 4 bucket ids through the SAME shared fold the
    // oracled batch keys use, appends to the TTL'd ListState, and
    // bumps the O(1) occupancy counter. Laws: the statestore holds
    // EXACTLY 4 member rows per vector (nothing lost, nothing
    // duplicated across micro-batch boundaries) and one counter row
    // per OCCUPIED bucket (== the batch bucket relation's distinct
    // (t, bkt) count). Throughput is the vectors-per-second a single
    // node sustains while paying per-element expiration bookkeeping.
    graft.functions.VectorExpressions.register(spark)
    val emb28 = graft.Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
    val embDir = s"$work/emb28"
    val chk28 = s"$work/chk28"
    val out28 = s"$work/out28"
    Seq(embDir, chk28, out28).foreach(p =>
      graft.Util.deleteRecursively(new java.io.File(p)))
    // No ordering contract (bucket ids are per-row deterministic):
    // one partitioned write, vectors scattered across micro-batches.
    emb28.repartition(chunks * 4).write.parquet(embDir)
    val nVecs = spark.read.parquet(embDir).count()
    series.clear(); inputSum.set(0L)
    val t28 = System.nanoTime()
    runTtlToCompletion(
      StreamQueries.lshBucketsTtlTws(
        graft.operators.LlmQueries.lshBuckets(
          spark.readStream.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
            .option("maxFilesPerTrigger", 4).parquet(embDir))
          .as[StreamQueries.LshIns], ttlMs).toDF()
        .writeStream.outputMode("update")
        .option("checkpointLocation", chk28)
        .foreachBatch { (b: DataFrame, bid: Long) =>
          b.write.mode("overwrite").parquet(s"$out28/batch=$bid")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(),
      nVecs, "st28")
    val sec28 = (System.nanoTime() - t28) / 1e9
    val memRows28 = spark.read.format("statestore")
      .option("stateVarName", "members").load(chk28).count()
    val occRows28 = spark.read.format("statestore")
      .option("stateVarName", "occ").load(chk28).count()
    val nBuckets = graft.operators.LlmQueries.lshBuckets(emb28)
      .select($"t", $"bkt").distinct().count()
    require(memRows28 == 4 * nVecs && occRows28 == nBuckets,
      s"st28 state rows (members=$memRows28, occ=$occRows28) != " +
        s"(4 x vecs=${4 * nVecs}, buckets=$nBuckets)")
    val bytes28 = dirBytes(s"$chk28/state")

    def fmt(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val seriesJson = series23
      .map(t => s"[${t._1},${t._2},${t._3}]").mkString("[", ",", "]")
    val json =
      s"""{"metric":"tws_bench","sf":"$sfDir","chunks":$chunks,""" +
        s""""st19":{"token_rows":$tokRows,"sec":${fmt(sec19)},""" +
        s""""rows_per_sec":${fmt(tokRows / sec19)},""" +
        s""""batches":$batches19,"docs":$nDocs,""" +
        s""""state_rows":$nState,"state_bytes":$bytes19,""" +
        s""""bit_equal_batch":true},""" +
        s""""st23":{"input_rows":$evRows,"users":$nUsers,""" +
        s""""sec":${fmt(sec23)},"rows_per_sec":${fmt(evRows / sec23)},""" +
        s""""delay_us":$delayUs,"peak_state_rows":$peak23,""" +
        s""""final_state_rows":$finalRows23,"state_bytes":$bytes23,""" +
        s""""emitted_rows":${got.count()},"equals_batch_scd2":true,""" +
        s""""series_batch_total_updated":$seriesJson},""" +
        s""""st25":{"input_rows":$evRows25,"users":$nUsers25,""" +
        s""""user_types":$userTypes,"sec":${fmt(sec25)},""" +
        s""""rows_per_sec":${fmt(evRows25 / sec25)},""" +
        s""""batches":$batches25,"final_state_rows":$finalRows25,""" +
        s""""state_bytes":$bytes25,""" +
        s""""equals_batch_agg":true,"state_law_users_x_types":true},""" +
        s""""st27":{"input_rows":$evRows25,"ttl_ms":$ttlMs,""" +
        s""""sec":${fmt(sec27)},""" +
        s""""rows_per_sec":${fmt(evRows25 / sec27)},""" +
        s""""types_rows":$typesRows27,"total_rows":$totalRows27,""" +
        s""""state_bytes":$bytes27,"equals_batch_agg":true,""" +
        s""""state_law_users_x_types":true},""" +
        s""""st28":{"vecs":$nVecs,"inserts":${4 * nVecs},""" +
        s""""ttl_ms":$ttlMs,"sec":${fmt(sec28)},""" +
        s""""vecs_per_sec":${fmt(nVecs / sec28)},""" +
        s""""inserts_per_sec":${fmt(4 * nVecs / sec28)},""" +
        s""""member_rows":$memRows28,"occ_rows":$occRows28,""" +
        s""""buckets":$nBuckets,"state_bytes":$bytes28,""" +
        s""""state_law_4x_vecs_and_buckets":true}}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_TWS_OUT",
      "target/twsbench.json")
    Files.createDirectories(Paths.get(outPath).toAbsolutePath.getParent)
    Files.writeString(Paths.get(outPath), json)
    println(json)
    spark.stop()
  }
}
