package graft

import graft.functions.VectorExpressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** fdot/fnorm2 must be drop-in replacements for the HOF folds:
  * bit-identical values (same sequential double accumulation), same
  * null semantics, and SQL-registered via both the imperative helper
  * and the SparkSessionExtensions class.
  */
class VectorExpressionsSpec extends SparkTestBase {

  import spark.implicits._

  private def vecs = {
    VectorExpressions.register(spark)
    Tables.load(spark, sf, "embeddings")
  }

  test("fnorm2 is bit-identical to the sequential HOF fold") {
    val both = vecs.select(
      expr("fnorm2(embedding)").as("fast"),
      aggregate($"embedding", lit(0.0),
        (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
        .as("slow"))
    assert(both.filter($"fast" =!= $"slow" ||
      $"fast".isNull =!= $"slow".isNull).count() == 0)
  }

  test("fdot is bit-identical to zip_with+aggregate on shifted pairs") {
    val a = vecs.limit(50).select($"vec_id", $"embedding".as("ea"))
    val b = vecs.limit(50).select(($"vec_id" - 1).as("vid2"),
      $"embedding".as("eb"))
    val both = a.join(b, $"vec_id" === $"vid2")
      .select(expr("fdot(ea, eb)").as("fast"),
        aggregate(zip_with($"ea", $"eb",
          (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
          lit(0.0), (acc, x) => acc + x).as("slow"))
    assert(both.count() > 0)
    assert(both.filter($"fast" =!= $"slow").count() == 0)
  }

  test("null semantics: null array, null element, length mismatch") {
    VectorExpressions.register(spark)
    val df = Seq(
      (1L, Array(1f, 2f), Array(3f, 4f)),
      (2L, null, Array(3f, 4f)),
      (3L, Array(1f, 2f, 5f), Array(3f, 4f))
    ).toDF("id", "a", "b")
      .withColumn("a",
        when($"id" === 4, array(lit(1f), lit(null).cast(FloatType)))
          .otherwise($"a"))
    val withNullElem = df.union(
      Seq((4L, Array(1f, 2f), Array(3f, 4f))).toDF("id", "a", "b")
        .withColumn("a", array(lit(1f), lit(null).cast(FloatType))))
    val got = withNullElem
      .select($"id", expr("fdot(a, b)").as("d"),
              expr("fnorm2(a)").as("n2"))
      .orderBy($"id").collect()
    assert(got(0).getDouble(1) == 1f * 3f + 2f * 4f)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2)) // null array
    assert(got(2).isNullAt(1)) // length mismatch
    assert(!got(2).isNullAt(2)) // but fnorm2 of the 3-vector is fine
    assert(got(3).isNullAt(1) && got(3).isNullAt(2)) // null element
  }

  test("interpreted eval path matches codegen path") {
    // Force interpreted evaluation by using the expression inside a
    // context Spark can't codegen-compile as a whole stage is hard to
    // pin; instead compare direct Expression.eval against the SQL
    // result for a literal row.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val a = new GenericArrayData(Array(1.5f, -2f, 0.25f))
    val lit_ = Literal.create(a, ArrayType(FloatType))
    val direct = VectorExpressions.FloatDot(lit_, lit_).eval(null)
      .asInstanceOf[Double]
    VectorExpressions.register(spark)
    val viaSql = spark.sql(
      "SELECT fdot(array(CAST(1.5 AS FLOAT), CAST(-2 AS FLOAT), " +
        "CAST(0.25 AS FLOAT)), array(CAST(1.5 AS FLOAT), " +
        "CAST(-2 AS FLOAT), CAST(0.25 AS FLOAT)))")
      .head().getDouble(0)
    assert(direct == viaSql)
    assert(direct == 1.5 * 1.5 + (-2.0) * (-2.0) + 0.25 * 0.25)
  }

  test("GraftExtensions applies cleanly and SQL surface works") {
    // A fresh session with spark.sql.extensions can't be built here
    // (the shared test session wins getOrCreate), so assert the
    // extension object injects without error and the registered SQL
    // surface resolves end-to-end in the current session.
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
    VectorExpressions.register(spark)
    val r = spark.sql("SELECT fnorm2(array(CAST(3 AS FLOAT), " +
      "CAST(4 AS FLOAT))) AS n").head().getDouble(0)
    assert(r == 25.0)
  }

  test("RewriteSelfDot: fdot(x, x) optimizes to fnorm2(x), same values") {
    VectorExpressions.register(spark)
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ graft.functions.RewriteSelfDot
    try {
      val df = Tables.load(spark, sf, "embeddings")
        .selectExpr("vec_id", "fdot(embedding, embedding) AS d",
                    "fnorm2(embedding) AS n")
      val opt = df.queryExecution.optimizedPlan
      val exprs = opt.expressions.flatMap(_.collect {
        case e: VectorExpressions.FloatDot => "fdot"
        case e: VectorExpressions.FloatNorm2 => "fnorm2"
      })
      assert(!exprs.contains("fdot"), s"self-dot not rewritten: $exprs")
      // Distinct operands must NOT be rewritten.
      val keep = Tables.load(spark, sf, "embeddings").limit(1)
        .selectExpr("fdot(embedding, slice(embedding, 1, 64)) AS d")
        .queryExecution.optimizedPlan
      assert(keep.collectFirst { case n if n.expressions.exists(
          _.collectFirst { case _: VectorExpressions.FloatDot => () }
            .isDefined) => () }.isDefined,
        "fdot over distinct operands must survive")
      // Values unchanged by the rewrite.
      assert(df.filter("d <> n").count() == 0)
    } finally spark.experimental.extraOptimizations = prev
  }
}
