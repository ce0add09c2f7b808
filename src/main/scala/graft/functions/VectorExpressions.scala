package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Native Catalyst expressions for the vector hot path (SURVEY.md §2.J
  * "custom Expression", §7.3): `fdot(a, b)` and `fnorm2(a)` over
  * `array<float>` columns.
  *
  * Why not the HOF forms (`aggregate(zip_with(a, b, *), 0d, +)`)?
  * Semantically identical, but the HOF chain materializes an
  * intermediate product array per row-pair and evaluates two lambda
  * closures per element. These expressions compile to a single fused
  * primitive loop inside whole-stage codegen — no allocation, no
  * virtual calls — which is what the kNN inner loop wants when the
  * candidate side is 10^9 rows, not 2×10^3.
  *
  * Determinism: the loop accumulates `(double)a[i] * (double)b[i]` in
  * element order — bit-identical to the sequential HOF fold and to the
  * DuckDB `list_reduce` mirror, so swapping them under an oracled
  * query does not move a single output bit.
  *
  * Null semantics match the HOF chain: NULL array → NULL; any NULL
  * element → NULL; mismatched lengths → NULL (zip_with pads with NULL,
  * which nulls the fold).
  */
object VectorExpressions {

  private def dotLoop(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  case class FloatDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (Seq(left, right).forall(e =>
          e.dataType.isInstanceOf[ArrayType] &&
          e.dataType.asInstanceOf[ArrayType].elementType == FloatType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"fdot expects (array<float>, array<float>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "fdot"

    override def nullSafeEval(a: Any, b: Any): Any =
      dotLoop(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |final int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |      ${ev.isNull} = true; break;
           |    }
           |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |  }
           |  if (!${ev.isNull}) ${ev.value} = $s;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): FloatDot =
      copy(left = newLeft, right = newRight)
  }

  case class FloatNorm2(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType.isInstanceOf[ArrayType] &&
          child.dataType.asInstanceOf[ArrayType].elementType == FloatType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"fnorm2 expects array<float>, got ${child.dataType.sql}")
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "fnorm2"

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      dotLoop(arr, arr)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        val x = ctx.freshName("x")
        s"""
           |final int $n = $a.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  final double $x = (double) $a.getFloat($i);
           |  $s += $x * $x;
           |}
           |if (!${ev.isNull}) ${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): FloatNorm2 = copy(child = newChild)
  }

  private[functions] val registrations: Seq[(FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("fdot"),
      new ExpressionInfo(classOf[FloatDot].getName, "fdot"),
      (es: Seq[Expression]) => FloatDot(es(0), es(1))),
    (FunctionIdentifier("fnorm2"),
      new ExpressionInfo(classOf[FloatNorm2].getName, "fnorm2"),
      (es: Seq[Expression]) => FloatNorm2(es.head)))

  /** Imperative registration for sessions not built with the
    * extension (idempotent; used by query definitions and tests). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}

/** Injected optimizer rule (`Rule[LogicalPlan]` surface): a self
  * dot-product `fdot(x, x)` is `fnorm2(x)` — one array traversal and
  * one null-check per element instead of two. Fires wherever a query
  * writes the cosine denominator the naive way; the rewrite is safe
  * exactly when the operand is deterministic (semantic equality of a
  * nondeterministic expr does not mean equal VALUES). */
object RewriteSelfDot
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.transformAllExpressions {
      case VectorExpressions.FloatDot(a, b)
          if a.deterministic && a.semanticEquals(b) =>
        VectorExpressions.FloatNorm2(a)
    }
}

/** Library-level injection point: build the session with
  * `spark.sql.extensions=graft.functions.GraftExtensions` and the
  * functions + optimizer rule exist in every derived session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    VectorExpressions.registrations.foreach(ext.injectFunction)
    TextNormalize.registrations.foreach(ext.injectFunction)
    TermHash.registrations.foreach(ext.injectFunction)
    ZInterleave.registrations.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RewriteSelfDot)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
