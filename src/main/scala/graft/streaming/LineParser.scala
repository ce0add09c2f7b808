package graft.streaming

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference genre's ingest step, modernized (SURVEY.md §0.1,
  * §1.3): raw sensor lines (CSV text) → typed rows via `from_csv`
  * against the explicit events schema → validity filter. Works
  * identically over `spark.read.text` and `spark.readStream.text` —
  * the batch-equivalence suite runs both.
  *
  * Malformed handling: `from_csv` yields null fields on parse failure
  * (PERMISSIVE); `valid` requires the key fields non-null plus the
  * genre's range check on the measurement. Rejected lines are counted,
  * not dropped silently — `parseWithRejects` returns both sides.
  */
object LineParser {

  private val csvOpts = Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSS")

  /** Parse raw CSV lines (column `value`) into typed event rows. */
  def parse(lines: DataFrame): DataFrame = {
    import lines.sparkSession.implicits._
    lines
      .select(from_csv($"value", Tables.events, csvOpts).as("e"))
      .select($"e.*")
  }

  /** Validity predicate: parseable key fields + in-range measurement
    * (the genre's out-of-range sensor filter). */
  def isValid = {
    import org.apache.spark.sql.Column
    val c: Column = col("event_id").isNotNull &&
      col("ts").isNotNull && col("user_id").isNotNull &&
      col("event_type").isin("click", "view", "purchase", "signup",
        "error") &&
      col("value").isNotNull && col("value") >= 0.0 &&
      col("value") <= 10000.0
    c
  }

  /** Parsed AND validated rows — the stream the rest of the engine
    * consumes. */
  def parseValid(lines: DataFrame): DataFrame =
    parse(lines).filter(isValid)

  /** Both sides, for observability: (valid, rejected-with-reason). */
  def parseWithRejects(lines: DataFrame): (DataFrame, DataFrame) = {
    val parsed = parse(lines)
    (parsed.filter(isValid),
     parsed.filter(!isValid)
       .withColumn("reject_reason",
         when(col("event_id").isNull || col("ts").isNull ||
              col("user_id").isNull, "unparseable")
           .when(col("value").isNull || col("value") < 0.0 ||
                 col("value") > 10000.0, "value_out_of_range")
           .otherwise("unknown_event_type")))
  }
}
