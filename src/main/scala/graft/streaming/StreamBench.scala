package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Streaming throughput benchmark (r6): rows/s through the namesake
  * pipeline — st1 parquet file-stream source → st2/st5 watermarked
  * tumbling windows → st10 checkpointed, partitioned parquet sink.
  *
  * Protocol mirrors `graft.Bench`: the replay staging is untimed, each
  * timed run gets a FRESH sink + checkpoint (so every run pays the
  * full source-listing / state-store / commit-log cost), and the
  * per-run seconds are reported as min + median over
  * `SPARK_GRAFT_RUNS` (default 3). Throughput = staged input rows /
  * elapsed seconds for the whole AvailableNow drain, micro-batch
  * overheads included — the honest number for a file-replay pipeline.
  *
  * Prints ONE JSON line and persists it to
  * `SPARK_GRAFT_STREAMBENCH_OUT` (default target/streambench.json).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt)
    val chunks = sys.env.getOrElse("SPARK_GRAFT_STREAM_CHUNKS", "10").toInt
    val work = sys.env.getOrElse("SPARK_GRAFT_STREAM_WORK", "target/streambench")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed staging: events replayed as `chunks` time-ordered files
    // plus the watermark-flush sentinel (chunks+1 source files total;
    // maxFilesPerTrigger=1 means chunks+1 micro-batches per run).
    val replay = s"$work/input"
    EventStreams.stageReplay(spark, sfDir, replay, chunks = chunks,
      sentinel = true)
    val inputRows = spark.read.parquet(replay).count()

    // Two state-store providers (r7, verdict item 7): the default
    // HDFS-backed in-memory store vs RocksDB. At 100 TB RocksDB is the
    // production path — state spills to local SSD instead of executor
    // heap, and changelog checkpointing bounds commit cost — so the
    // gate tracks both. Same staged input, same exactly-once check;
    // the provider conf is snapshotted per streaming query, so setting
    // it between runs is sufficient.
    //
    // Batch-size sweep (r8, verdict item 6): the fixed ~1.2 s/trigger
    // micro-batch overhead (source listing + state commit + sink
    // commit-log write) dominates at sf0.1 and hides the per-row
    // pipeline cost. Each provider runs three chunkings of the SAME
    // staged input: maxFilesPerTrigger unset (one AvailableNow pass —
    // per-row cost with exactly one commit), 5 (~3 micro-batches) and
    // 1 (chunks+1 micro-batches, the replay-fidelity mode). The
    // rows/s spread across the sweep IS the commit-cost isolation:
    // single-pass is the pipeline's throughput ceiling, the mft=1
    // deficit divided by the extra batch count is the per-batch cost.
    var sinkRows = -1L
    def runConfig(tag: String, mft: Int): (Double, Double) = {
      val times = (1 to runs).map { i =>
        val out = s"$work/out-$tag$i"
        val chk = s"$work/chk-$tag$i"
        graft.Util.deleteRecursively(new java.io.File(out))
        graft.Util.deleteRecursively(new java.io.File(chk))
        val t0 = System.nanoTime()
        val stream = EventStreams.readEventStream(spark, replay, mft)
        val windows = StreamQueries.tumblingWatermarked(stream)
        EventStreams.runToCompletion(
          EventStreams.parquetSink(windows, out, chk)
            .partitionBy("event_type"))
        val sec = (System.nanoTime() - t0) / 1e9
        // Exactly-once check: every run, chunking AND provider must
        // sink the same window set.
        val rows = spark.read.parquet(out).count()
        if (sinkRows < 0) sinkRows = rows
        require(rows == sinkRows && rows > 0,
          s"$tag run $i sank $rows rows, expected $sinkRows")
        sec
      }.sorted
      (times.head, times(runs / 2))
    }
    def f(v: Double): String = f"$v%.3f"
    val sweep = Seq(("single", 0), ("mft5", 5), ("mft1", 1))
    def runProvider(provider: String): String =
      sweep.map { case (cfg, mft) =>
        val (mn, md) = runConfig(s"$provider-$cfg", mft)
        s""""$cfg":{"rows_per_sec":${f(inputRows / mn)},""" +
          s""""sec_min":${f(mn)},"sec_median":${f(md)}}"""
      }.mkString("{", ",", "}")
    val hdfs = runProvider("hdfs")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rocks = runProvider("rocksdb")
    // Headline value stays the hdfs mft=1 replay-fidelity number for
    // continuity with the r6/r7 records.
    val headline = {
      val i = hdfs.indexOf("\"mft1\":{\"rows_per_sec\":")
      hdfs.substring(i + 23, hdfs.indexOf(",", i))
    }
    val json =
      s"""{"metric":"stream_rows_per_sec","value":$headline,""" +
        s""""unit":"rows/sec","runs":$runs,"input_rows":$inputRows,""" +
        s""""sink_rows":$sinkRows,"chunks":$chunks,""" +
        s""""hdfs":$hdfs,"rocksdb":$rocks,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_OUT",
      "target/streambench.json")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).toAbsolutePath.getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(json)
    spark.stop()
  }
}
