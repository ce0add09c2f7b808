package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input to the weighted-mean UDAF: a money value in exact integer
  * cents plus an integer weight (events.props.k). Integer arithmetic
  * keeps the aggregation order-independent — required for the DuckDB
  * hash-compare (SURVEY.md §7.4 P1) — and makes partial/final merge
  * exact on a cluster.
  */
case class WInput(cents: Long, w: Long)
case class WBuf(var swc: Long, var sw: Long)

/** 2.J UDAF surface: typed Aggregator registered via functions.udaf.
  * Weighted mean = sum(cents*w) / (100 * sum(w)), finishing in double.
  */
object WeightedMeanAgg extends Aggregator[WInput, WBuf, Double] {
  def zero: WBuf = WBuf(0L, 0L)
  def reduce(b: WBuf, a: WInput): WBuf = {
    b.swc += a.cents * a.w; b.sw += a.w; b
  }
  def merge(b1: WBuf, b2: WBuf): WBuf = {
    b1.swc += b2.swc; b1.sw += b2.sw; b1
  }
  def finish(b: WBuf): Double =
    if (b.sw == 0L) Double.NaN else b.swc.toDouble / (100.0 * b.sw.toDouble)
  def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
