package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen polynomial string hash (SURVEY.md §2.J "custom
  * Expression" surface, second instance after fdot/fnorm2):
  * `termhash(s, m, mod)` = fold over the code points of `s` of
  * `h -> (h * m + cp) % mod`, h0 = 0.
  *
  * Folds CODE POINTS (codePointAt), matching the DuckDB
  * `list_reduce(string_split(s, ''), …)` oracle mirror, which also
  * iterates code points (0-seeded fold == init-less fold under this
  * recurrence because 0*m + c1 = c1). For BMP/single-code-unit strings
  * this is additionally bit-identical to the HOF form the operators
  * previously inlined — `aggregate(split(s, ''), 0L, (h, c) ->
  * pmod(h*m + ascii(c), mod))`; for supplementary-plane input (emoji,
  * rare CJK) the HOF folded lone UTF-16 surrogates and DIVERGES from
  * both this expression and the oracle — the code-point semantics is
  * the intended one (pinned in TermHashSpec). The HOF chain also
  * regex-splits the string into a
  * per-character array and evaluates a lambda closure per element;
  * this expression is one primitive loop inside whole-stage codegen —
  * no array, no closures — which is what the per-occurrence hashing in
  * sketch_cms / dedup_hamming64 / dedup_simhash wants when the corpus
  * is 10^11 tokens, not 10^5.
  *
  * Contract: `m` and `mod` are positive literals with
  * m * mod + 0x10FFFF < 2^63 (all shipped uses: m <= 149, mod <=
  * TextBlocking.MaskMod = 2^55 − 55 — no overflow). Null string → null.
  */
object TermHash {

  /** Plain-JVM twin of the expression's code-point fold — for stateful
    * stream processors (st19's incremental minhash) and tests that
    * must hash identically OFF the codegen path. Same contract:
    * m * mod + 0x10FFFF < 2^63. */
  def hash(s: String, m: Long, mod: Long): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      h = (h * m + cp) % mod
    }
    h
  }

  case class TermHashExpr(first: Expression, second: Expression,
                          third: Expression) extends TernaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (first.dataType == StringType &&
          second.dataType == LongType && third.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"termhash expects (string, bigint, bigint), got " +
          s"(${first.dataType.sql}, ${second.dataType.sql}, " +
          s"${third.dataType.sql})")
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "termhash"

    override def nullSafeEval(str: Any, m: Any, mod: Any): Any =
      hash(str.asInstanceOf[UTF8String].toString,
        m.asInstanceOf[Long], mod.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (str, m, mod) => {
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        s"""
           |final String $s = $str.toString();
           |long $h = 0L;
           |for (int $i = 0; $i < $s.length(); ) {
           |  final int $cp = $s.codePointAt($i);
           |  $i += java.lang.Character.charCount($cp);
           |  $h = ($h * $m + $cp) % $mod;
           |}
           |${ev.value} = $h;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newFirst: Expression, newSecond: Expression,
        newThird: Expression): TermHashExpr =
      copy(first = newFirst, second = newSecond, third = newThird)
  }

  private[functions] val registrations: Seq[(FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("termhash"),
      new ExpressionInfo(classOf[TermHashExpr].getName, "termhash"),
      (es: Seq[Expression]) => TermHashExpr(es(0), es(1), es(2))))

  /** Imperative registration for sessions not built with the
    * extension (idempotent; used by query definitions and tests). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
