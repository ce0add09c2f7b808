package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Reusable sensor time-series building blocks — the public surface
  * behind the oracled `ts_*` keys (SURVEY.md §2.N, the namesake
  * domain). `resample` reshapes to a dense grid; the other functions
  * AUGMENT the caller's frame (all input columns preserved, result
  * columns appended) so they compose like `withColumn`. Every window
  * partitions by the caller's series key and orders by the
  * collision-free (time, id) composite; every running scan is
  * frame-bounded (no whole-partition buffering).
  */
object TimeSeries {

  private def seriesWindow(seriesCol: String, tsSecCol: String,
      idCol: String) =
    Window.partitionBy(col(seriesCol)).orderBy(col(tsSecCol), col(idCol))

  /** Resample to a fixed-width grid per series, zero-filling empty
    * bins: the plot/join-ready densification of a sparse stream. The
    * grid spans the GLOBAL [min, max] bin range crossed with the
    * distinct series keys; everything after the first groupBy runs on
    * the reduced (series, bin) relation. Output: (series, bin,
    * bin_start_sec, n, sum_v). */
  def resample(events: DataFrame, seriesCol: String, tsSecCol: String,
      valueCol: String, binSec: Long): DataFrame = {
    val e = events.select(col(seriesCol).as("series"),
        col(tsSecCol).as("sec"), col(valueCol).as("value"))
      .withColumn("bin", floor(col("sec") / binSec))
    val agg = e.groupBy(col("series"), col("bin"))
      .agg(count(lit(1)).as("n"), graft.Det.dsum(col("value")).as("sum_v"))
    val grid = e.agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("bin"))
      .crossJoin(e.select(col("series")).distinct())
    grid.join(agg, Seq("series", "bin"), "left")
      .select(col("series"), col("bin").cast(LongType).as("bin"),
        (col("bin") * binSec).cast(LongType).as("bin_start_sec"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("sum_v"), lit(0.0)).as("sum_v"))
  }

  /** Last-observation-carried-forward: appends `filled` — the latest
    * at-or-before `valueCol` of the rows matching `isObservation`
    * within the same series (NULL until the first observation). One
    * frame-bounded running window; all input columns preserved. */
  def locf(events: DataFrame, seriesCol: String, tsSecCol: String,
      idCol: String, valueCol: String, isObservation: Column)
      : DataFrame = {
    val w = seriesWindow(seriesCol, tsSecCol, idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__obs", when(isObservation, col(valueCol)))
      .withColumn("filled", last(col("__obs"), ignoreNulls = true).over(w))
      .drop("__obs")
  }

  /** Rolling spike detection: appends (wsum, wn, spike) where `spike`
    * means `valueCol` exceeds `factor`× the trailing `lookback`-row
    * mean of its series — compared MULTIPLICATIVELY over exact
    * decimal sums (value·n > factor·sum): no float accumulation, no
    * division. All input columns preserved. */
  def rollingSpike(events: DataFrame, seriesCol: String, tsSecCol: String,
      idCol: String, valueCol: String, lookback: Int = 20,
      factor: Int = 2): DataFrame = {
    val w = seriesWindow(seriesCol, tsSecCol, idCol)
      .rowsBetween(-(lookback - 1), Window.currentRow)
    events
      .withColumn("wsum", sum(graft.Det.money(col(valueCol))).over(w))
      .withColumn("wn", count(lit(1)).over(w))
      .withColumn("spike",
        graft.Det.money(col(valueCol)) * col("wn") > col("wsum") * factor)
  }

  /** Discrete derivative between consecutive readings per series:
    * appends (delta_v, delta_s, rate) and DROPS each series' first
    * row (no predecessor). `valueScaled` must be an exact integer
    * representation (e.g. cents); deltas stay exact integers and
    * `rate` is the single final IEEE division — NULL on same-second
    * pairs (undefined, not infinite). All input columns preserved. */
  def rate(events: DataFrame, seriesCol: String, tsSecCol: String,
      idCol: String, valueScaled: Column): DataFrame = {
    val w = seriesWindow(seriesCol, tsSecCol, idCol)
    events
      .withColumn("__v", valueScaled)
      .withColumn("__psec", lag(col(tsSecCol), 1).over(w))
      .withColumn("__pv", lag(col("__v"), 1).over(w))
      .filter(col("__psec").isNotNull)
      .withColumn("delta_v", col("__v") - col("__pv"))
      .withColumn("delta_s", col(tsSecCol) - col("__psec"))
      .withColumn("rate",
        when(col(tsSecCol) > col("__psec"),
          col("delta_v").cast("double") / col("delta_s").cast("double")))
      .drop("__v", "__psec", "__pv")
  }

  /** Robust median/MAD outlier gate per series — the estimator that
    * survives the contaminated sensor it hunts (one stuck-at-9999
    * reading drags a mean-based threshold; the median ignores it).
    * `valueScaled` must be an exact integer representation (cents):
    * medians are DISCRETE lower medians selected by rank (n+1)÷2 —
    * a member value, never an interpolation — and the flag is the
    * 3σ-equivalent |x−med| > 3·1.4826·MAD kept in integers as
    * dev·10⁴ > mad·44478 (MAD = 0 degenerates to any-deviation-
    * flags). Appends (med_c, mad_c, robust_z_pm, outlier); all input
    * columns preserved. Three series-keyed passes that reuse one
    * hash partitioning. */
  def madOutliers(events: DataFrame, seriesCol: String, idCol: String,
      valueScaled: Column): DataFrame = {
    def discMedian(df: DataFrame, vCol: String, out: String) = df
      .withColumn("__rn", row_number().over(Window
        .partitionBy(col(seriesCol)).orderBy(col(vCol), col(idCol))))
      .withColumn("__nn", count(lit(1)).over(
        Window.partitionBy(col(seriesCol))))
      .filter(col("__rn") === expr("(__nn + 1) div 2"))
      .select(col(seriesCol), col(vCol).as(out))
    val e = events.withColumn("__c", valueScaled)
    val med = discMedian(e.select(col(seriesCol), col(idCol),
      col("__c")), "__c", "med_c")
    val dev = e.join(med, seriesCol)
      .withColumn("__dev", abs(col("__c") - col("med_c")))
    val mad = discMedian(dev.select(col(seriesCol), col(idCol),
      col("__dev")), "__dev", "mad_c")
    dev.join(mad, seriesCol)
      .withColumn("robust_z_pm",
        expr("__dev * 1000 div greatest(mad_c, 1L)"))
      .withColumn("outlier", col("__dev") * 10000L > col("mad_c") * 44478L)
      .drop("__c", "__dev")
  }

  /** Rolling exact lower median over a trailing `width`-row frame per
    * series — madOutliers' windowed twin (the robust smoother a
    * spiky sensor needs where a rolling mean chases every spike).
    * The frame is collected (O(width) state — a DECLARED bound,
    * never history-sized), sorted, and the lower median selected by
    * rank (n+1) div 2; over integer values this is exactly
    * reproducible anywhere (never an interpolating percentile).
    * Augment-style: input columns + (n_window, roll_med). */
  def rollingMedian(events: DataFrame, seriesCol: String,
      tsCol: String, tieCol: String, valueCol: String,
      width: Int = 20): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    val w = Window.partitionBy(col(seriesCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-(width - 1), 0)
    events
      .withColumn("__arr", sort_array(collect_list(col(valueCol)).over(w)))
      .withColumn("n_window", size(col("__arr")).cast("long"))
      .withColumn("roll_med", expr(
        "element_at(__arr, CAST((size(__arr) + 1) div 2 AS INT))"))
      .drop("__arr")
  }
}
