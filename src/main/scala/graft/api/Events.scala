package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable event-sequence building blocks — the public surface behind
  * the oracled sessionization / sequence keys (SURVEY.md §2.E/§2.N).
  * Inputs are caller-named columns; outputs use documented standard
  * names. Every window partitions by the high-cardinality entity key,
  * so no task ever holds more than one entity's history.
  */
object Events {

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event reaches `gapSec`. One (entity)(time, id)
    * window then one aggregate. Output: (user_id, sid, n_events,
    * start_s, dur_s) with 1-based session ids per entity. */
  def sessionize(events: DataFrame, userCol: String, tsSecCol: String,
      idCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    events.select(col(userCol).as("user_id"), col(idCol).as("event_id"),
        col(tsSecCol).as("ts_s"))
      .withColumn("gap",
        when(lag(col("ts_s"), 1).over(w).isNull ||
             col("ts_s") - lag(col("ts_s"), 1).over(w) >= gapSec, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("gap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_s")).as("start_s"),
        (max(col("ts_s")) - min(col("ts_s"))).as("dur_s"))
  }

  /** Adjacent-sequence pattern match (MATCH_RECOGNIZE shape): rows
    * where `pattern` occurs as CONSECUTIVE event types in the
    * entity's (time, id)-ordered stream. length(pattern)−1 leads over
    * ONE window — a single shuffle on the entity key, no self-joins.
    * Output: per-entity (user_id, n_matches, first_sec). */
  def seqPattern(events: DataFrame, userCol: String, typeCol: String,
      tsSecCol: String, idCol: String, pattern: Seq[String]): DataFrame = {
    require(pattern.length >= 2, "pattern needs at least 2 steps")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    val base = events.select(col(userCol).as("user_id"),
      col(typeCol).as("event_type"), col(tsSecCol).as("sec"),
      col(idCol).as("event_id"))
    val withLeads = pattern.indices.tail.foldLeft(base) { (df, i) =>
      df.withColumn(s"t$i", lead(col("event_type"), i).over(w))
    }
    val cond = pattern.indices.tail
      .map(i => col(s"t$i") === pattern(i))
      .foldLeft(col("event_type") === pattern.head)(_ && _)
    withLeads.filter(cond)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("sec")).as("first_sec"))
  }
}
