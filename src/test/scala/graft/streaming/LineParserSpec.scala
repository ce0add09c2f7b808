package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The genre's ingest contract: CSV sensor lines parse to typed rows,
  * malformed/out-of-range lines are rejected with a reason, and the
  * SAME parser runs over a text file stream with identical results.
  */
class LineParserSpec extends SparkTestBase {

  import spark.implicits._

  /** events rendered as CSV lines (timestamp in the parser's format),
    * plus injected garbage. */
  private def stageLines(dir: String): Unit = {
    val ev = Tables.load(spark, sf, "events")
      .select(concat_ws(",",
        $"event_id",
        date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSS"),
        $"user_id", $"event_type",
        $"value".cast(org.apache.spark.sql.types.DecimalType(18, 4))
          .cast("string"), $"props").as("value"))
    val garbage = Seq(
      "not,a,valid,line,at,all",
      "12x,2024-01-01 00:00:00.000,5,click,1.0,{}",   // bad id
      "13,2024-01-01 00:00:00.000,5,click,-4.5,{}",   // negative value
      "14,2024-01-01 00:00:00.000,5,teleport,1.0,{}", // unknown type
      "garbage").toDF("value")
    ev.unionAll(garbage).coalesce(1)
      .write.mode("overwrite").text(dir)
  }

  test("batch: parse + validate recovers exactly the clean rows") {
    val dir = scratch("lines_batch")
    stageLines(dir)
    val (valid, rejects) = LineParser.parseWithRejects(
      spark.read.text(dir))
    assert(valid.count() == Tables.load(spark, sf, "events").count())
    // ids survive the round-trip
    val wantIds = Tables.load(spark, sf, "events")
      .select($"event_id").orderBy($"event_id")
    assertSameRows(valid.select($"event_id").orderBy($"event_id"),
      wantIds, "ids")
    val reasons = rejects.groupBy($"reject_reason").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(reasons.getOrElse("unparseable", 0L) >= 2L)
    assert(reasons.getOrElse("value_out_of_range", 0L) == 1L)
    assert(reasons.getOrElse("unknown_event_type", 0L) == 1L)
  }

  test("streaming: same parser over readStream.text == batch result") {
    val dir = scratch("lines_stream")
    stageLines(dir)
    val stream = spark.readStream.option("maxFilesPerTrigger", 1)
      .text(dir)
    val q = LineParser.parseValid(stream)
      .select($"event_id", $"user_id", $"event_type")
      .writeStream.format("memory").queryName("lines_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val want = LineParser.parseValid(spark.read.text(dir))
      .select($"event_id", $"user_id", $"event_type")
    assertSameRows(spark.table("lines_out"), want, "stream vs batch")
  }
}
