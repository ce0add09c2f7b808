package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable warehouse-modeling building blocks — the public surface
  * behind the oracled `dim_*` keys (SURVEY.md §2.L): slowly-changing-
  * dimension history over ANY (entity, timestamp, tiebreak, tracked
  * attribute) change stream, and the incremental MERGE a 100-TB
  * warehouse actually runs nightly (the full rebuild is the oracle of
  * the merge — see dim_scd2_merge's adjudication).
  *
  * Column contract: `scd2` emits (keyCol, version, attrCol,
  * valid_from, valid_to, is_current) with validity in epoch
  * microseconds; `scd2Merge`'s `hist` must be an `scd2` output (same
  * six columns) and `delta` a change stream strictly LATER than every
  * hist row — same-key ties across the boundary are impossible when
  * the cutoff is a timestamp predicate, which is the intended use.
  * All joins are keyed by the dimension's natural key; the history
  * shuffles once against the delta, never re-sorts all of time.
  */
object Warehouse {

  /** SCD type-2 history build: collapse a change stream into
    * versioned rows, writing a row only when `attrCol` CHANGES (the
    * first row per key always counts). Two window passes — lag
    * change-detect, then version/validity over the collapsed rows —
    * sharing one `keyCol` hash exchange. */
  def scd2(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", unix_micros(col(tsCol)))
      .withColumn("valid_to", unix_micros(lead(col(tsCol), 1).over(w)))
      .withColumn("is_current", lead(col(tsCol), 1).over(w).isNull)
      .select(col(keyCol), col("version"), col(attrCol),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** Incremental SCD2 MERGE of a delta change stream into a stored
    * history: (1) detect changes INSIDE the delta with the same lag
    * pass as the full build, seeding each key's first delta row
    * against its CURRENT open attribute (the last pre-cutoff value by
    * construction, so the change test is exactly the full build's);
    * (2) version new rows by offsetting row_number with the stored
    * max; (3) close each affected key's open row at its first new
    * change. Merge ≡ full rebuild row-for-row — assert it against
    * `scd2` on the concatenated stream (the keyed query's DuckDB
    * oracle does exactly that). */
  def scd2Merge(hist: DataFrame, delta: DataFrame, keyCol: String,
      tsCol: String, tieCol: String, attrCol: String): DataFrame = {
    val cur = hist.filter(col("is_current"))
      .select(col(keyCol), col("version").as("__cur_ver"),
        col(attrCol).as("__cur_attr"))
    val dw = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val chg = delta
      .withColumn("__prev", lag(col(attrCol), 1).over(dw))
      .join(cur, Seq(keyCol), "left_outer")
      .filter((col("__prev").isNull &&
          (col("__cur_attr").isNull || col("__cur_attr") =!= col(attrCol))) ||
        (col("__prev").isNotNull && col("__prev") =!= col(attrCol)))
    val newRows = chg
      .withColumn("version",
        (row_number().over(dw) + coalesce(col("__cur_ver"), lit(0L)))
          .cast("long"))
      .withColumn("valid_from", unix_micros(col(tsCol)))
      .withColumn("valid_to", unix_micros(lead(col(tsCol), 1).over(dw)))
      .withColumn("is_current", lead(col(tsCol), 1).over(dw).isNull)
      .select(col(keyCol), col("version"), col(attrCol),
        col("valid_from"), col("valid_to"), col("is_current"))
    val firstNew = newRows.groupBy(col(keyCol))
      .agg(min(col("valid_from")).as("__close_us"))
    val histAdj = hist.join(firstNew, Seq(keyCol), "left_outer")
      .select(col(keyCol), col("version"), col(attrCol), col("valid_from"),
        when(col("is_current") && col("__close_us").isNotNull,
          col("__close_us")).otherwise(col("valid_to")).as("valid_to"),
        (col("is_current") && col("__close_us").isNull).as("is_current"))
    histAdj.unionByName(newRows)
  }

  /** Point-in-time (AS OF) fact enrichment over an `scd2` history:
    * each fact row picks up `attrCol` from the dimension version
    * whose validity interval covers the fact's OWN epoch-µs
    * timestamp — the non-anticipation join that keeps event-time
    * features from leaking the future. Validity intervals partition
    * time per key, so each fact matches at most one version (no row
    * multiplication); facts with no covering version (pre-first-
    * change, or unknown keys) keep a null `attrCol` under the left
    * join. The join is keyed by the dimension's natural key with the
    * interval as a post-match predicate; at scale the history is
    * bounded by change count — broadcast it or co-partition both
    * sides on the key. Output: the fact frame + `attrCol`. */
  def pitLookup(facts: DataFrame, factKeyCol: String,
      factTsUsCol: String, hist: DataFrame, histKeyCol: String,
      attrCol: String): DataFrame =
    facts.join(
        hist.select(col(histKeyCol).as("__hk"), col(attrCol),
          col("valid_from"), col("valid_to")),
        col(factKeyCol) === col("__hk") &&
          col("valid_from") <= col(factTsUsCol) &&
          (col("valid_to").isNull ||
            col(factTsUsCol) < col("valid_to")),
        "left_outer")
      .drop("__hk", "valid_from", "valid_to")
}
