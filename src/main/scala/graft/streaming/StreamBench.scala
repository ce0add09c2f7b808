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
    var sinkRows = -1L
    def runProvider(tag: String): (Double, Double) = {
      val times = (1 to runs).map { i =>
        val out = s"$work/out-$tag$i"
        val chk = s"$work/chk-$tag$i"
        graft.Util.deleteRecursively(new java.io.File(out))
        graft.Util.deleteRecursively(new java.io.File(chk))
        val t0 = System.nanoTime()
        val stream = EventStreams.readEventStream(spark, replay)
        val windows = StreamQueries.tumblingWatermarked(stream)
        EventStreams.runToCompletion(
          EventStreams.parquetSink(windows, out, chk)
            .partitionBy("event_type"))
        val sec = (System.nanoTime() - t0) / 1e9
        // Exactly-once check: every run AND every provider must sink
        // the same window set.
        val rows = spark.read.parquet(out).count()
        if (sinkRows < 0) sinkRows = rows
        require(rows == sinkRows && rows > 0,
          s"$tag run $i sank $rows rows, expected $sinkRows")
        sec
      }.sorted
      (times.head, times(runs / 2))
    }
    val (minSec, medSec) = runProvider("hdfs")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val (rMin, rMed) = runProvider("rocksdb")
    def f(v: Double): String = f"$v%.3f"
    val json =
      s"""{"metric":"stream_rows_per_sec","value":${f(inputRows / minSec)},""" +
        s""""unit":"rows/sec","runs":$runs,"input_rows":$inputRows,""" +
        s""""sink_rows":$sinkRows,"chunks":$chunks,""" +
        s""""sec_min":${f(minSec)},"sec_median":${f(medSec)},""" +
        s""""rows_per_sec_median":${f(inputRows / medSec)},""" +
        s""""rocksdb":{"rows_per_sec":${f(inputRows / rMin)},""" +
        s""""sec_min":${f(rMin)},"sec_median":${f(rMed)}},"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_OUT",
      "target/streambench.json")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).toAbsolutePath.getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(json)
    spark.stop()
  }
}
