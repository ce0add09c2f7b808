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

  test("AQE skew-join splits the hot partition without manual salting") {
    // r8, verdict item 5: the runtime counterpart of the salting
    // rewrite. With adaptive skew-join thresholds scaled down to the
    // test fixture (the defaults target 256 MB shuffle partitions),
    // AQE must detect the hot key's oversized shuffle partition and
    // split it into multiple tasks — pinned by `isSkewJoin = true` on
    // the executed SortMergeJoin — with NO change to the query text
    // and byte-identical results. PLANS.md (r8) records when manual
    // salting still wins: pre-shuffle aggregation on a skewed group
    // key (AQE only rewrites joins), and plans that must preserve the
    // join's output partitioning for a downstream co-located consumer
    // (AQE skips the split rather than break the requirement).
    val tuned = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50k",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~90% of fact rows on key 1, with an incompressible ~96-byte
      // payload so the hot key's shuffle partition crosses the scaled
      // 100k skew threshold while the median partition stays tiny.
      val fact = spark.range(0, 200000)
        .select($"id",
          when(pmod($"id", lit(10)) < 9, 1L).otherwise($"id").as("k"),
          concat(md5($"id".cast("string")),
            md5(($"id" + 1).cast("string")),
            md5(($"id" + 2).cast("string"))).as("pay"))
      val dim = spark.range(0, 2000)
        .select($"id".as("k"), concat(lit("d"), $"id").as("label"))
      // sum(length(pay)) keeps the payload column alive through the
      // join — otherwise Catalyst prunes it and the shuffled rows are
      // bare longs, far below any skew threshold.
      val agg = fact.hint("merge").join(dim, "k")
        .groupBy($"label")
        .agg(count(lit(1)).as("n"), sum(length($"pay")).as("bytes"))
      val got = agg.collect()

      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val adaptive = agg.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("no AdaptiveSparkPlanExec in executed plan"))
      // String pin (not .collect): materialized stages hang off
      // QueryStageExec LEAVES, which collect() does not traverse; the
      // tree string renders through them. `skew=true` is the
      // SortMergeJoinExec.isSkewJoin flag OptimizeSkewedJoin sets, and
      // `skewed` is the AQEShuffleRead reader mode doing the split.
      val planStr = adaptive.executedPlan.toString
      assert(planStr.contains("skew=true") && planStr.contains("skewed"),
        s"OptimizeSkewedJoin did not fire:\n$planStr")

      // Byte-identical to the broadcast plan (no skew machinery at all).
      val want = fact.join(broadcast(dim), "k")
        .groupBy($"label")
        .agg(count(lit(1)).as("n"), sum(length($"pay")).as("bytes"))
        .collect()
      assert(got.map(_.toString).sorted.sameElements(
        want.map(_.toString).sorted), "AQE skew-join result differs")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
