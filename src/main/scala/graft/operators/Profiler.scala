package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-scan column profiler (SURVEY.md §2.M `profile_table` /
  * `profile_sketch`) — the data-quality pass a training-data ingest
  * runs before anything else: per column, row count, non-null count,
  * distinct count, min and max.
  *
  * Two n_distinct modes:
  *  - `exact = false` (the 100-TB default): HLL++ sketches
  *    (`approx_count_distinct`, rsd 2%). ONE two-phase aggregate over
  *    the scan — partial sketches merge map-side, the shuffle carries
  *    a few KB per partition regardless of input size. A profiler
  *    rarely needs exact cardinalities; this is the plan that survives
  *    a 1000-executor scan.
  *  - `exact = true` (the oracle-able form): melt the profiled columns
  *    map-side (array-of-struct explode — a narrow projection, no
  *    Expand), then a two-phase aggregate on (col, value) whose
  *    partial side collapses each partition to its distinct values, so
  *    the shuffle carries only distinct (col, value) pairs with
  *    counts. A second (tiny) aggregate folds per-value rows to one
  *    row per column.
  *
  * Values are profiled as DECIMAL(18,2) and extrema emitted as DOUBLE
  * — bit-identical cross-engine (the decimal is exact; the final
  * decimal→double rounding is a single IEEE operation).
  */
object Profiler {

  private def dec(c: String): Column =
    expr(s"CAST($c AS DECIMAL(18,2))")

  /** Profile `cols` of `df` in one scan; returns one row per column
    * with schema (n, col, n_nonnull, n_distinct, min_v, max_v),
    * ordered by column name. */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    if (exact) profileExact(df, cols) else profileSketch(df, cols)
  }

  private def profileExact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val entries = cols.map(c =>
      struct(lit(c).as("col"), dec(c).as("v")))
    df.select(explode(array(entries: _*)).as("e"))
      .select($"e.col".as("col"), $"e.v".as("v"))
      .groupBy($"col", $"v").agg(count(lit(1)).as("c"))
      .groupBy($"col").agg(
        sum($"c").as("n"),
        sum(when($"v".isNotNull, $"c").otherwise(0L)).as("n_nonnull"),
        count($"v").as("n_distinct"),
        min($"v").cast(DoubleType).as("min_v"),
        max($"v").cast(DoubleType).as("max_v"))
      .select($"n", $"col", $"n_nonnull", $"n_distinct",
        $"min_v", $"max_v")
      .orderBy($"col")
  }

  private def profileSketch(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.zipWithIndex.flatMap { case (c, i) => Seq(
      count(col(c)).as(s"nn_$i"),
      approx_count_distinct(col(c), 0.02).as(s"nd_$i"),
      min(dec(c)).cast(DoubleType).as(s"min_$i"),
      max(dec(c)).cast(DoubleType).as(s"max_$i"))
    }
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', nn_$i, nd_$i, min_$i, max_$i"
    }.mkString(", ")
    val allAggs = count(lit(1)).as("n") +: aggs
    df.agg(allAggs.head, allAggs.tail: _*)
      .select($"n", expr(
        s"stack(${cols.size}, $stackArgs) " +
          "AS (col, n_nonnull, n_distinct, min_v, max_v)"))
      .orderBy($"col")
  }
}
