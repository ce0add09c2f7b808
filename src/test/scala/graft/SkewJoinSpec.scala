package graft

import org.apache.spark.sql.functions._

/** The skew playbook (SURVEY.md §7.5): when one join key dominates, a
  * plain shuffle join puts the hot key's entire fact-side partition on
  * one task. The salting rewrite — explode the dim side N ways, salt
  * the fact side with pmod(id, N) — spreads the hot key over N tasks
  * and must return byte-identical results. (AQE's skew-join split
  * handles this at runtime for sort-merge joins; salting is the
  * explicit form that also works for aggregations.)
  */
class SkewJoinSpec extends SparkTestBase {

  import spark.implicits._

  private val SALT = 8

  test("salted join == plain join on skewed data") {
    // Skewed fact: 90% of rows carry key 1.
    val fact = spark.range(0, 20000)
      .select($"id",
        when(pmod($"id", lit(10)) < 9, 1L).otherwise($"id").as("k"))
    val dim = spark.range(0, 2000)
      .select($"id".as("k"), concat(lit("d"), $"id").as("label"))

    val plain = fact.join(dim, "k")
      .groupBy($"label").agg(count(lit(1)).as("n"))

    // Salt: fact rows pick one of SALT buckets; dim replicates into
    // all of them, so every (k, salt) pair still matches exactly once.
    val saltedFact = fact.withColumn("salt",
      pmod($"id", lit(SALT)).cast("int"))
    val saltedDim = dim.withColumn("salt",
      explode(sequence(lit(0), lit(SALT - 1))))
    val salted = saltedFact.join(saltedDim, Seq("k", "salt"))
      .groupBy($"label").agg(count(lit(1)).as("n"))

    assertSameRows(salted, plain, "salted vs plain")

    // The salted shuffle key space for the hot key is SALT× wider:
    // hot key rows land in SALT distinct (k, salt) groups.
    val hotGroups = saltedFact.filter($"k" === 1L)
      .select($"salt").distinct().count()
    assert(hotGroups == SALT)
  }

  test("salted aggregation == plain aggregation on skewed keys") {
    val fact = spark.range(0, 20000)
      .select($"id",
        when(pmod($"id", lit(10)) < 9, 1L).otherwise($"id").as("k"),
        (pmod($"id", lit(100))).cast("double").as("v"))
    val plain = fact.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v".cast("long")).as("s"))
    // Two-phase manual salt: partial agg per (k, salt), then final.
    val partial = fact
      .withColumn("salt", pmod($"id", lit(SALT)))
      .groupBy($"k", $"salt")
      .agg(count(lit(1)).as("pn"), sum($"v".cast("long")).as("ps"))
    val fin = partial.groupBy($"k")
      .agg(sum($"pn").as("n"), sum($"ps").as("s"))
    assertSameRows(fin, plain, "salted agg vs plain")
  }
}
