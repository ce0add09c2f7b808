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
  *    a 1000-executor scan. Error bound asserted vs the exact mode in
  *    ProfilerSpec.
  *  - `exact = true` (the oracle-able form): melt the profiled columns
  *    map-side (array-of-struct explode — a narrow projection, no
  *    Expand), then a two-phase aggregate on (col, value) whose
  *    partial side collapses each partition to its distinct values, so
  *    the shuffle carries only distinct (col, value) pairs with
  *    counts. A second (tiny) aggregate folds per-value rows to one
  *    row per column.
  *
  * Distinctness is counted on the RAW value (its canonical string
  * rendering — injective for numeric types), never on a lossy cast:
  * values differing past 2 decimals, or >= 1e16 (where a DECIMAL(18,2)
  * cast nulls out in non-ANSI mode), stay distinct, matching what
  * `count(DISTINCT col)` computes in any engine. Extrema alone are
  * profiled as DECIMAL(18,2) and emitted as DOUBLE — bit-identical
  * cross-engine (the decimal is exact; the final decimal→double
  * rounding is a single IEEE operation).
  *
  * An EMPTY input still yields one row per profiled column
  * (n = n_nonnull = n_distinct = 0, null extrema) in both modes, like
  * a global aggregate would.
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
    // Floating columns: fold -0.0 into 0.0 (x + 0.0 is the IEEE
    // identity except on -0.0) BEFORE the string rendering — the two
    // zeros render as distinct strings but count(DISTINCT) (and the
    // DuckDB oracle) treat them as one value.
    val fieldType = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // (same-typed zero literal: a double 0.0 would widen FloatType and
    // change the string rendering of every float)
    def keyed(c: String): Column = fieldType.get(c) match {
      case Some(FloatType)  => col(c) + lit(0.0f)
      case Some(DoubleType) => col(c) + lit(0.0)
      case _ => col(c)
    }
    val entries = cols.map(c =>
      struct(lit(c).as("col"),
        keyed(c).cast(StringType).as("k"), dec(c).as("v")))
    val agged = df.select(explode(array(entries: _*)).as("e"))
      .select($"e.col".as("col"), $"e.k".as("k"), $"e.v".as("v"))
      // k determines v (same raw value), so per-(col,k) min = max = v;
      // carrying both keeps the fold associative without re-deriving
      // the decimal from the string key.
      .groupBy($"col", $"k").agg(count(lit(1)).as("c"),
        min($"v").as("mn"), max($"v").as("mx"))
      .groupBy($"col").agg(
        sum($"c").as("n"),
        sum(when($"k".isNotNull, $"c").otherwise(0L)).as("n_nonnull"),
        count($"k").as("n_distinct"),
        min($"mn").cast(DoubleType).as("min_v"),
        max($"mx").cast(DoubleType).as("max_v"))
    // Empty input: the per-value aggregate yields no rows at all —
    // re-attach the column list so every column still reports n = 0.
    val colsDf = cols.toDF("col")
    colsDf.join(agged, Seq("col"), "left")
      .select(coalesce($"n", lit(0L)).as("n"), $"col",
        coalesce($"n_nonnull", lit(0L)).as("n_nonnull"),
        coalesce($"n_distinct", lit(0L)).as("n_distinct"),
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
