package graft

import org.apache.spark.sql.functions._

/** Laws for the r11c additions: graph_jaccard, join_bloom,
  * curate_dsir, text_diversity, dim_scd2_merge. All five are DuckDB
  * -oracled; these pin the semantics the hash can't see — similarity
  * bounds and top-k ordering, the lossless-reduction equivalence of
  * the bloom prefilter, DSIR's target/raw separation, diversity
  * metric bounds, and the merge≡rebuild + validity-chain algebra.
  */
class R11cOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def q(key: String) = SparkEntry.queries(key)(spark, sf)

  test("graph_jaccard: bounds, top-k shape, rank monotone in jaccard") {
    val got = q("graph_jaccard").cache()
    try {
      assert(got.count() > 0, "empty jaccard output — vacuous")
      assert(got.filter($"jacc_ppm" <= 0 || $"jacc_ppm" > 1000000)
        .count() == 0, "jaccard ppm out of (0, 1e6]")
      assert(got.filter($"s1" === $"s2").count() == 0, "self-pair")
      assert(got.filter($"rk" < 1 || $"rk" > 5).count() == 0,
        "rank outside 1..5")
      val badGroups = got.groupBy($"s1")
        .agg(count(lit(1)).as("n"), countDistinct($"rk").as("nd"))
        .filter($"n" > 5 || $"n" =!= $"nd").count()
      assert(badGroups == 0, "a supplier has >5 rows or duplicate ranks")
      // Within a supplier, similarity never increases with rank.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"s1").orderBy($"rk")
      val inversions = got
        .withColumn("prev", lag($"jacc_ppm", 1).over(w))
        .filter($"prev".isNotNull && $"prev" < $"jacc_ppm").count()
      assert(inversions == 0, "jacc_ppm increases down the rank list")
      // common never exceeds either capped degree, so jacc <= 1 holds
      // structurally: jacc_ppm == 1e6 only for identical part sets.
      assert(got.filter($"common" < 1).count() == 0, "common < 1")
    } finally got.unpersist()
  }

  test("graph_jaccard: hub cap binds at sf0.01 (non-vacuous branch)") {
    val deg = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select($"l_partkey".as("p"), $"l_suppkey".as("sup")).distinct()
      .groupBy($"p").agg(count(lit(1)).as("pd"))
    val hubs = deg.filter($"pd" > operators.GraphQueries.jaccHubCap).count()
    assert(hubs > 0,
      s"cap ${operators.GraphQueries.jaccHubCap} excludes no part at " +
        "sf0.01 — the declared hub branch would be dead at the gate SF")
  }

  test("join_bloom: bucket prefilter is invisible in the answer") {
    val got = q("join_bloom")
    // The reduction's entire contract: identical to the plain join.
    val dim = Tables.load(spark, sf, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val want = Tables.load(spark, sf, "orders")
      .join(dim, $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum($"o_totalprice").as("sum_price"))
    assertSameRows(got, want.orderBy($"o_orderpriority"), "join_bloom")
    // And the prefilter must actually plan as a broadcast semi join
    // feeding the exact join — the shape IS the operator.
    val plan = q("join_bloom").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), s"no broadcast semi prefilter:\n$plan")
  }

  test("curate_dsir: target slice scores higher than the rest") {
    val got = q("curate_dsir").cache()
    try {
      val n = Tables.load(spark, sf, "documents").count()
      assert(got.count() == n, "every document must be scored")
      assert(got.filter($"n_terms" <= 0).count() == 0, "empty doc")
      assert(got.filter($"selected" =!= ($"score" > 0L)).count() == 0,
        "selected must be exactly score > 0")
      // Separation: mean en score strictly above mean non-en score,
      // and the en slice is majority-selected. (The fixture's langs
      // have disjoint character sets, so the hashed profiles separate
      // sharply — if this fails, the feature hash or the LLR table is
      // broken, not the fixture.)
      val Seq(enMean, restMean) = Seq("lang = 'en'", "lang <> 'en'")
        .map(p => got.filter(expr(p))
          .agg(avg($"score".cast("double"))).head().getDouble(0))
      assert(enMean > restMean,
        s"no target separation: en mean $enMean <= rest mean $restMean")
      val enSel = got.filter($"lang" === "en")
      assert(enSel.filter($"selected").count() * 2 > enSel.count(),
        "majority of target-language docs must score positive")
    } finally got.unpersist()
  }

  test("text_diversity: metric bounds and internal consistency") {
    val got = q("text_diversity").cache()
    try {
      assert(got.count() ==
        Tables.load(spark, sf, "documents").count())
      assert(got.filter($"n_distinct" > $"n_terms").count() == 0)
      assert(got.filter($"max_tf" > $"n_terms").count() == 0)
      assert(got.filter($"ttr_pm" < 1 || $"ttr_pm" > 1000).count() == 0,
        "ttr out of (0, 1000]")
      assert(got.filter($"gini_ppm" < 0 || $"gini_ppm" >= 1000000)
        .count() == 0, "gini out of [0, 1e6)")
      // All-distinct doc: gini = (n²-n)/n² exactly; single-term doc:
      // gini = 0, ttr floor(1000/n). Construct both inline.
      val allDistinct = got.filter($"n_distinct" === $"n_terms")
      assert(allDistinct.filter(
        $"gini_ppm" =!= expr("(n_terms * n_terms - n_terms) * 1000000" +
          " div (n_terms * n_terms)")).count() == 0,
        "all-distinct gini formula mismatch")
    } finally got.unpersist()
  }

  test("ts_outlier_mad: median membership, flag algebra, robustness") {
    val got = q("ts_outlier_mad").cache()
    try {
      val n = Tables.load(spark, sf, "events").count()
      assert(got.count() == n, "every event must be scored")
      // med_c must be an actual cents value of that user (discrete
      // median — never an interpolation).
      val medNotMember = got.select($"user_id", $"med_c").distinct()
        .join(got.select($"user_id", $"cents".as("med_c")).distinct(),
          Seq("user_id", "med_c"), "left_anti").count()
      assert(medNotMember == 0, "interpolated median leaked in")
      assert(got.filter($"mad_c" < 0).count() == 0, "negative MAD")
      // Flag is exactly the declared integer gate.
      val badFlag = got.filter($"outlier" =!=
        (abs($"cents" - $"med_c") * 10000L > $"mad_c" * 44478L)).count()
      assert(badFlag == 0, "outlier flag disagrees with its algebra")
      // Robustness (the reason this op exists): a constructed series
      // with one wild value must flag ONLY that value — a mean-based
      // 3σ gate over the same data would have its threshold dragged.
      import spark.implicits._
      val probe = (1 to 20).map(i => (i.toLong, 1L, 100L + (i % 3))) :+
        (21L, 1L, 999999L)
      val p = probe.toDF("event_id", "user_id", "cents")
      val med = p.stat.approxQuantile("cents", Array(0.5), 0).head
      val mean = p.agg(avg($"cents")).head().getDouble(0)
      assert(med < 200 && mean > 47000,
        s"median ($med) must ignore the wild value the mean ($mean) " +
          "is dragged by — the MAD gate's reason to exist")
    } finally got.unpersist()
  }

  test("text_ngrams: rank shape, ordering, df<=occ, bigram structure") {
    val got = q("text_ngrams").cache()
    try {
      assert(got.count() == 100, "top-100 cut")
      assert(got.agg(min($"rk"), max($"rk"), countDistinct($"rk"))
        .head().toSeq == Seq(1L, 100L, 100L), "ranks not 1..100")
      val w = org.apache.spark.sql.expressions.Window.orderBy($"rk")
      assert(got.withColumn("prev", lag($"n_occ", 1).over(w))
        .filter($"prev".isNotNull && $"prev" < $"n_occ").count() == 0,
        "n_occ increases down the ranking")
      assert(got.filter($"n_docs" > $"n_occ" || $"n_docs" < 1)
        .count() == 0, "document frequency out of [1, n_occ]")
      assert(got.filter(size(split($"bigram", " ")) =!= 2).count() == 0,
        "a bigram is not exactly two space-joined terms")
    } finally got.unpersist()
  }

  test("sketch_kmv_ops: estimator bounds and accuracy vs exact sets") {
    val got = q("sketch_kmv_ops").cache()
    try {
      assert(got.count() == 10, "C(5,2) unordered type pairs")
      assert(got.filter($"jacc_ppm" < 0 || $"jacc_ppm" > 1000000)
        .count() == 0, "jaccard estimate outside [0, 1e6]")
      assert(got.filter($"j_hits" > $"k_eff" || $"k_eff" > 32)
        .count() == 0, "hits exceed sketch size")
      // Accuracy law: the from-sketch union estimate must land within
      // the KMV error envelope of the EXACT union (k=32 → σ ≈ 18%;
      // 4σ bound keeps the law tight but non-flaky, per ProfilerSpec
      // conventions).
      val ev = Tables.load(spark, sf, "events")
        .select($"event_type", $"user_id").distinct().cache()
      try {
        val rows = got.select($"ta", $"tb", $"est_union", $"jacc_ppm")
          .collect()
        rows.foreach { r =>
          val (ta, tb) = (r.getString(0), r.getString(1))
          val both = ev.filter($"event_type" === ta ||
            $"event_type" === tb)
          val exactU = both.select($"user_id").distinct().count().toDouble
          val est = r.getDouble(2)
          assert(math.abs(est - exactU) / exactU < 0.72,
            s"($ta,$tb) union est $est vs exact $exactU beyond 4σ")
        }
      } finally ev.unpersist()
    } finally got.unpersist()
  }

  test("graph_distance: BFS consistency and seed laws") {
    val got = q("graph_distance").cache()
    try {
      assert(got.filter($"dist" < 0 ||
        $"dist" > operators.GraphQueries.bfsRounds).count() == 0,
        "distance outside [0, rounds]")
      // Seeds are exactly the dist-0 rows.
      val seeds = got.filter($"dist" === 0)
      assert(seeds.filter(($"node" < 1000000000L) ||
        (($"node" - 1000000000L) % 10 =!= 0)).count() == 0,
        "a non-seed node has distance 0")
      assert(seeds.count() > 0, "no seeds — vacuous")
      assert(got.filter($"dist" >= 2).count() > 0,
        "no multi-hop node — BFS never propagated")
      // Triangle consistency: every dist-d>0 node has an in-neighbor
      // at dist d-1 (the defining property of BFS layers).
      val ed = Tables.load(spark, sf, "lineitem")
        .select($"l_partkey".as("p"),
          ($"l_suppkey" + 1000000000L).as("sn")).distinct()
      val edges = ed.select($"p".as("src"), $"sn".as("dst"))
        .unionByName(ed.select($"sn".as("src"), $"p".as("dst")))
      val parent = got.select($"node".as("src"), $"dist".as("pd"))
      val orphan = got.filter($"dist" > 0)
        .join(edges, got("node") === edges("dst"))
        .join(parent, Seq("src"))
        .groupBy(got("node"), got("dist"))
        .agg(min($"pd").as("best"))
        .filter($"best" =!= got("dist") - 1)
        .count()
      assert(orphan == 0, "a BFS layer skips a level")
    } finally got.unpersist()
  }

  test("sink_bucketed: the join consumes the bucket layout directly") {
    val joined = q("sink_bucketed")
    joined.collect()
    // AQE's toString appends "== Initial Plan ==" after the final
    // plan; only the final section is what actually ran.
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).toSeq
    assert(exchanges.size <= 1,
      s"bucketed join still shuffles its inputs:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Bucketed: true"),
      s"scan did not use the bucketed layout:\n$plan")
  }

  test("dim_scd2_merge: incremental merge == full rebuild, chain laws") {
    val merged = q("dim_scd2_merge").cache()
    try {
      // The headline law (also the oracle, but pinned Spark-side so a
      // DuckDB quirk can never mask a merge bug).
      assertSameRows(merged, q("dim_scd2"), "merge vs rebuild")
      // Validity-chain algebra: per user exactly one open row,
      // versions contiguous from 1, each valid_to = next valid_from.
      val bad = merged.groupBy($"user_id").agg(
          count(lit(1)).as("n"),
          sum(when($"is_current", 1L).otherwise(0L)).as("open"),
          min($"version").as("vmin"), max($"version").as("vmax"))
        .filter($"open" =!= 1L || $"vmin" =!= 1L || $"vmax" =!= $"n")
        .count()
      assert(bad == 0, "broken version chain or open-row count")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"version")
      val gaps = merged
        .withColumn("nxt", lead($"valid_from", 1).over(w))
        .filter($"nxt".isNotNull && $"valid_to" =!= $"nxt").count()
      assert(gaps == 0, "valid_to does not chain to next valid_from")
      // Non-vacuous: the fixture must have rows on BOTH sides of the
      // merge cutoff, users whose open row was closed by the delta,
      // and brand-new post-cutoff users are possible but not required.
      val tUs = java.time.Instant.parse("2024-01-16T00:00:00Z")
        .toEpochMilli * 1000L
      assert(merged.filter($"valid_from" < tUs).count() > 0 &&
        merged.filter($"valid_from" >= tUs).count() > 0,
        "cutoff does not split the fixture — merge path vacuous")
      assert(merged.filter($"valid_from" < tUs && $"valid_to" >= tUs)
        .count() > 0, "no history row closed by a delta change")
    } finally merged.unpersist()
  }
}
