package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Runnable namesake pipeline (SURVEY.md §7.1 M5, st1→st2→st5→st10):
  * replay the events table as a file stream → 1-hour tumbling windows
  * behind a 1-hour watermark → checkpointed parquet sink partitioned
  * by event_type.
  *
  * Usage: runMain graft.streaming.StreamDemo [sfDir] [workDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val work = if (args.length > 1) args(1) else "target/streamdemo"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val replay = s"$work/input"
    EventStreams.stageReplay(spark, sfDir, replay, chunks = 5,
      sentinel = true)
    val stream = EventStreams.readEventStream(spark, replay)
    val windows = StreamQueries.tumblingWatermarked(stream)
    EventStreams.runToCompletion(
      EventStreams.parquetSink(windows, s"$work/out", s"$work/chk")
        .partitionBy("event_type"))

    val sunk = spark.read.parquet(s"$work/out")
    println(s"[streamdemo] sink rows: ${sunk.count()}")
    sunk.orderBy("ws", "event_type").show(10, truncate = false)
    spark.stop()
  }
}
