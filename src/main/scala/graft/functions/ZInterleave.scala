package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession

/** Native codegen Morton/z-order bit interleave (SURVEY.md §2.F
  * sort_zorder; third custom-Expression instance after fdot/fnorm2 and
  * termhash): `zinterleave(a, b, bits)` = OR over i in [0, bits) of
  * ((a >> i) & 1) << 2i  |  ((b >> i) & 1) << (2i+1).
  *
  * Identical values to the HOF form sort_zorder previously inlined —
  * `aggregate(sequence(0, bits-1), 0L, (acc, i) -> acc |
  * shiftleft(shiftright(a, i) & 1, 2*i) | ...)` — and to the DuckDB
  * `list_sum(list_transform(...))` oracle mirror (per-bit contributions
  * hit disjoint positions, so OR == sum). The HOF materializes a
  * 16-element array and evaluates a lambda closure per element per
  * row; this is one primitive loop inside whole-stage codegen — the
  * difference between a layout job that z-sorts 10^11 rows in one scan
  * and one that spends its CPU allocating arrays (r6 verdict item 4:
  * sort_zorder was the heaviest non-iterative bench key at 1.67 s).
  *
  * Contract: `bits` in [0, 32] (2*bits result bits must fit a long
  * with the sign bit untouched so `div` bucketing stays non-negative);
  * inputs are treated as unsigned bit patterns below `bits`. Any null
  * input → null.
  */
object ZInterleave {

  case class ZInterleaveExpr(first: Expression, second: Expression,
                             third: Expression) extends TernaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (first.dataType == LongType && second.dataType == LongType &&
          third.dataType == IntegerType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"zinterleave expects (bigint, bigint, int), got " +
          s"(${first.dataType.sql}, ${second.dataType.sql}, " +
          s"${third.dataType.sql})")
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "zinterleave"

    override def nullSafeEval(a: Any, b: Any, bits: Any): Any = {
      val av = a.asInstanceOf[Long]
      val bv = b.asInstanceOf[Long]
      val n = bits.asInstanceOf[Int]
      if (n < 0 || n > 32)
        throw new IllegalArgumentException(
          s"zinterleave bits must be in [0, 32], got $n")
      var z = 0L
      var i = 0
      while (i < n) {
        z |= ((av >> i) & 1L) << (2 * i)
        z |= ((bv >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, bits) => {
        val z = ctx.freshName("z")
        val i = ctx.freshName("i")
        s"""
           |if ($bits < 0 || $bits > 32) {
           |  throw new IllegalArgumentException(
           |    "zinterleave bits must be in [0, 32], got " + $bits);
           |}
           |long $z = 0L;
           |for (int $i = 0; $i < $bits; $i++) {
           |  $z |= (($a >> $i) & 1L) << (2 * $i);
           |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
           |}
           |${ev.value} = $z;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): ZInterleaveExpr =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  private[functions] val registrations: Seq[(FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("zinterleave"),
      new ExpressionInfo(classOf[ZInterleaveExpr].getName, "zinterleave"),
      (es: Seq[Expression]) => ZInterleaveExpr(es(0), es(1), es(2))))

  /** Imperative registration for sessions not built with the
    * extension (idempotent; used by query definitions and tests). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
