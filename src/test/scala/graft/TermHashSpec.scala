package graft

import org.apache.spark.sql.functions._

/** The codegen `termhash` must equal the HOF fold it replaced,
  * bit-for-bit, for every (multiplier, modulus) the operators use —
  * otherwise swapping it under an oracled query would move outputs.
  */
class TermHashSpec extends SparkTestBase {
  import spark.implicits._

  private def hof(m: Long, mod: Long) =
    expr(s"aggregate(split(term, ''), CAST(0 AS BIGINT), " +
      s"(h, c) -> pmod(h * $m + ascii(c), $mod))")

  test("termhash == HOF polynomial fold on the real corpus terms") {
    graft.functions.TermHash.register(spark)
    val terms = Tables.load(spark, sf, "documents")
      .select(explode(split(lower($"text"), " ")).as("term"))
      .filter($"term" =!= "").distinct()
    for ((m, mod) <- Seq((131L, 65536L), (137L, 65536L), (139L, 65536L),
                         (149L, 65536L), (31L, 1048576L))) {
      val bad = terms
        .withColumn("a", expr(s"termhash(term, ${m}L, ${mod}L)"))
        .withColumn("b", hof(m, mod))
        .filter($"a" =!= $"b")
      assert(bad.isEmpty, s"termhash($m, $mod) diverges from the HOF: " +
        bad.limit(3).collect().mkString(", "))
    }
  }

  test("termhash folds code points for supplementary-plane input") {
    graft.functions.TermHash.register(spark)
    // U+1F600 GRINNING FACE: one code point, two UTF-16 units. The
    // intended (and DuckDB-oracle-matching) semantics folds the code
    // point 0x1F600, NOT the surrogate pair — pin it.
    val mod = 1048576L
    val rows = Seq("😀", "a😀b").toDF("term")
      .withColumn("h", expr(s"termhash(term, 131L, ${mod}L)"))
      .collect()
    assert(rows(0).getLong(1) == 0x1F600L % mod)
    val expected = (('a'.toLong * 131L + 0x1F600L) % mod * 131L
      + 'b'.toLong) % mod
    assert(rows(1).getLong(1) == expected)
  }

  test("termhash edge cases: empty string, single char, null") {
    graft.functions.TermHash.register(spark)
    val df = Seq(Some(""), Some("a"), Some("zz"), None).toDF("term")
      .withColumn("h", expr("termhash(term, 131L, 65536L)"))
    val rows = df.collect()
    assert(rows(0).getLong(1) == 0L)                    // "" -> 0
    assert(rows(1).getLong(1) == 'a'.toLong)            // "a" -> 97
    assert(rows(2).getLong(1) == ('z' * 131L + 'z') % 65536)
    assert(rows(3).isNullAt(1))                         // null -> null
  }
}
