package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming source/sink plumbing (SURVEY.md §2.I st1, st10).
  *
  * The namesake pipeline of the reference genre — sensor events in,
  * durable partitioned files out — maps to: parquet file stream source
  * with an explicit schema (st1) → event-time transforms → parquet
  * `FileStreamSink` with a checkpoint and `_spark_metadata` commit log
  * (st10, exactly-once per file).
  *
  * Scale notes: the file source lists + replays files per trigger
  * (`maxFilesPerTrigger` bounds batch size); state stores and the sink
  * commit log live on the checkpoint FS (HDFS-compatible at scale);
  * the sink partitions by event_type — at 100 TB add a time-bucket
  * partition key so file counts per directory stay bounded.
  */
object EventStreams {

  /** st1 — parquet file stream source over a replay directory, with
    * the explicit events schema (file sources cannot infer).
    * `maxFilesPerTrigger <= 0` leaves the option unset: under
    * `Trigger.AvailableNow` that drains ALL staged files in one
    * micro-batch — the single-pass mode the throughput sweep uses to
    * isolate per-row pipeline cost from per-batch commit-log cost. */
  def readEventStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Int = 1): DataFrame = {
    val r = spark.readStream.schema(Tables.events)
    (if (maxFilesPerTrigger > 0)
       r.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else r).parquet(dir)
  }

  /** Fixed base for staged-chunk modification times — any stable epoch
    * works; only the strict per-chunk ordering matters. */
  private val chunkEpochMs: Long =
    java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli

  /** Move a just-written single-part chunk from its temp write dir
    * into `dir` under a deterministic name with a strictly increasing
    * modification time. FileStreamSource replays files ordered by
    * (modTime, path); part files written back-to-back can tie at the
    * filesystem's modTime granularity, and the tiebreak over random
    * part-UUID paths then replays chunks out of order — which makes a
    * time-ordered staging look like >watermark-late data and silently
    * drops rows. Explicit stamps make replay order a staged invariant
    * instead of a timing accident. */
  private[streaming] def promoteChunk(tmpDir: String, dir: String,
                                      idx: Int, ext: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val parts = new java.io.File(tmpDir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(ext))
    require(parts.length == 1,
      s"expected exactly 1 part file in $tmpDir, found ${parts.length}")
    Files.createDirectories(Paths.get(dir))
    val dst = Paths.get(dir, f"chunk-$idx%05d$ext")
    Files.move(parts.head.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
    require(dst.toFile.setLastModified(chunkEpochMs + idx * 60000L),
      s"could not stamp modTime on $dst")
    graft.Util.deleteRecursively(new java.io.File(tmpDir))
  }

  /** Stage the batch events table as an ordered sequence of chunk
    * files under `replayDir`, so the file source replays it as a
    * stream in event-time order. Optionally append a far-future
    * sentinel event (event_type "wmflush") whose only job is to push
    * the watermark past every real event so append-mode windows all
    * emit before the query stops.
    */
  def stageReplay(spark: SparkSession, sfDir: String, replayDir: String,
                  chunks: Int, sentinel: Boolean): Unit = {
    import spark.implicits._
    graft.Util.deleteRecursively(new java.io.File(replayDir))
    val ev = Tables.load(spark, sfDir, "events").orderBy($"ts", $"event_id")
    val rows = ev.count()
    val per = math.max(1, (rows + chunks - 1) / chunks)
    // Deterministic time-ordered chunks: orderBy + coalesce(1) keeps
    // one ordered partition, so monotonic ids follow event time.
    val withChunk = ev.coalesce(1)
      .withColumn("rn", monotonically_increasing_id())
      .withColumn("chunk", (col("rn") / per).cast("int"))
      .drop("rn")
      .cache()
    try {
      val n = withChunk.agg(max($"chunk")).head().getInt(0)
      (0 to n).foreach { i =>
        val tmp = s"${replayDir}_tmp"
        withChunk.filter($"chunk" === i).drop("chunk")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        promoteChunk(tmp, replayDir, i, ".parquet")
      }
    } finally withChunk.unpersist()
    if (sentinel) {
      val maxTs = Tables.load(spark, sfDir, "events")
        .agg(max($"ts")).head().getTimestamp(0)
      val far = new java.sql.Timestamp(maxTs.getTime + 48L * 3600 * 1000)
      val row = Seq((Long.MaxValue, far, -1L, "wmflush", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val tmp = s"${replayDir}_tmp"
      row.coalesce(1).write.mode("overwrite").parquet(tmp)
      promoteChunk(tmp, replayDir, chunks + 1, ".parquet")
    }
  }

  /** st10 — checkpointed, partitioned parquet sink (the namesake op).
    * `_spark_metadata` in outDir makes re-reads exactly-once per file.
    */
  def parquetSink(df: DataFrame, outDir: String, checkpointDir: String)
      : DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")

  /** Run any streaming writer to completion over all currently
    * available input (Trigger.AvailableNow), honoring
    * maxFilesPerTrigger chunking — the replay harness used by the
    * batch-equivalence suite and the demo main. */
  def runToCompletion(w: DataStreamWriter[Row]): Unit = {
    val q: StreamingQuery = w.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }
}
