package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Covers the remaining 2.J surface (scalar UDF, demo-only per
  * SURVEY.md — builtins stay the engine path) and the §7.5 bucketing
  * story: a bucketed co-located join must plan with no shuffle
  * exchange on either side.
  */
class UdfAndBucketingSpec extends SparkTestBase {

  import spark.implicits._

  test("scalar UDF surface: udf() result == codegen builtin result") {
    // The builtin path (fn_regex) is what ships; the UDF exists to
    // prove the extension surface and to measure what it costs.
    val tailNum = udf((name: String) => {
      val m = "(\\d+)$".r.findFirstIn(name)
      m.map(_.toLong).getOrElse(-1L)
    })
    val c = Tables.load(spark, sf, "customer")
    val viaUdf = c.select($"c_custkey", tailNum($"c_name").as("n"))
      .filter($"n" =!= -1L)
    val viaBuiltin = c.select($"c_custkey",
        regexp_extract($"c_name", "(\\d+)$", 1).cast(LongType).as("n"))
      .filter(regexp_extract($"c_name", "(\\d+)$", 1) =!= "")
    assertSameRows(viaUdf, viaBuiltin, "udf vs builtin")
    // And the SQL-registered form:
    spark.udf.register("tail_num", tailNum)
    val viaSql = c.createOrReplaceTempView("cust_udf_t")
    val sqlRows = spark.sql(
      "SELECT c_custkey, tail_num(c_name) AS n FROM cust_udf_t " +
        "WHERE tail_num(c_name) <> -1")
    assertSameRows(sqlRows, viaBuiltin, "sql udf vs builtin")
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    val wh = scratch("bucketing")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .write.mode("overwrite")
      .option("path", s"$wh/li_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    Tables.load(spark, sf, "orders")
      .select($"o_orderkey", $"o_orderstatus")
      .write.mode("overwrite")
      .option("path", s"$wh/ord_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    val joined = spark.table("li_b")
      .join(spark.table("ord_b").hint("merge"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"))
    joined.collect()
    // AQE's toString appends "== Initial Plan ==" after the final
    // plan; only the final section is what actually ran.
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // The SMJ must consume the bucketed layout directly: the only
    // exchange allowed is the one for the 3-row final aggregation.
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(exchanges.size <= 1,
      s"bucketed join still shuffles its inputs:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Bucketed: true"),
      s"scan did not use the bucketed layout:\n$plan")
    // Same result as the unbucketed join, of course.
    val want = Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    assertSameRows(joined, want, "bucketed vs plain")
  }
}
