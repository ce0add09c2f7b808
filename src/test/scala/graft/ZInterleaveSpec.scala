package graft

import org.apache.spark.sql.functions._

/** The codegen `zinterleave` must equal the HOF fold it replaced,
  * bit-for-bit — it sits under the oracled sort_zorder key, so any
  * divergence moves hashed output.
  */
class ZInterleaveSpec extends SparkTestBase {
  import spark.implicits._

  private val hof = expr(
    "aggregate(sequence(0, 15), 0L, (acc, i) -> " +
      "acc | shiftleft(shiftright(a, i) & 1L, 2 * i) " +
      "| shiftleft(shiftright(b, i) & 1L, 2 * i + 1))")

  test("zinterleave == HOF z-fold on the real lineitem keys") {
    graft.functions.ZInterleave.register(spark)
    val keys = Tables.load(spark, sf, "lineitem")
      .select($"l_partkey".as("a"), $"l_suppkey".as("b")).distinct()
    val bad = keys
      .withColumn("zn", expr("zinterleave(a, b, 16)"))
      .withColumn("zh", hof)
      .filter($"zn" =!= $"zh")
    assert(bad.isEmpty, "zinterleave diverges from the HOF: " +
      bad.limit(3).collect().mkString(", "))
  }

  test("zinterleave known values, bit width, and nulls") {
    graft.functions.ZInterleave.register(spark)
    val df = Seq(
      (Some(0L), Some(0L)),     // -> 0
      (Some(1L), Some(0L)),     // a bit 0 -> z bit 0
      (Some(0L), Some(1L)),     // b bit 0 -> z bit 1
      (Some(3L), Some(3L)),     // -> 0b1111
      (Some(0xFFFFL), Some(0xFFFFL)), // full 16-bit -> 2^32 - 1
      (None, Some(1L)))
      .toDF("a", "b")
      .withColumn("z", expr("zinterleave(a, b, 16)"))
    val z = df.collect()
    assert(z(0).getLong(2) == 0L)
    assert(z(1).getLong(2) == 1L)
    assert(z(2).getLong(2) == 2L)
    assert(z(3).getLong(2) == 15L)
    assert(z(4).getLong(2) == (1L << 32) - 1)
    assert(z(5).isNullAt(2))
    // bits beyond the width are ignored: only the low 4 bits interleave
    val w4 = Seq((0xF0FL, 0L)).toDF("a", "b")
      .selectExpr("zinterleave(a, b, 4) AS z").head().getLong(0)
    assert(w4 == 0x55L) // 0b1111 interleaved with 0 -> 0b01010101
  }

  test("zinterleave rejects out-of-range bit widths") {
    graft.functions.ZInterleave.register(spark)
    val e = intercept[Exception] {
      Seq((1L, 1L)).toDF("a", "b")
        .selectExpr("zinterleave(a, b, 33)").collect()
    }
    assert(e.getMessage != null)
  }
}
