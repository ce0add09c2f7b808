package graft

import org.apache.spark.sql.functions._

/** Laws for the r11 curation additions: dedup_semantic,
  * sample_reservoir, curate_domain_mix. Cross-engine equality is the
  * DuckDB oracle's job (all three are oracled); these pin the
  * semantics the hash can't see — survivor invariants, equivalence of
  * the distributed top-k to a full sort, and the cap algebra.
  */
class R11OpsSpec extends SparkTestBase {

  import spark.implicits._

  private def q(key: String) = SparkEntry.queries(key)(spark, sf)

  test("dedup_semantic: total relation, canonical min-id survivors") {
    val got = q("dedup_semantic").cache()
    try {
      val n = Tables.load(spark, sf, "embeddings").count()
      assert(got.count() == n, "every vector must appear exactly once")
      assert(got.select($"vec_id").distinct().count() == n,
        "vec_id must be unique")
      // comp is the component MINIMUM label: never above the member.
      assert(got.filter($"comp" > $"vec_id").count() == 0,
        "comp must be the min id of its component")
      // keep is exactly the canonical predicate.
      assert(got.filter($"keep" =!= ($"vec_id" === $"comp")).count() == 0,
        "keep must equal (vec_id == comp)")
      // Every referenced component label is itself a KEPT row — the
      // survivor a pipeline joins back onto must exist.
      val orphans = got.select($"comp".as("c")).distinct()
        .join(got.filter($"keep").select($"vec_id".as("c")),
              Seq("c"), "left_anti").count()
      assert(orphans == 0, s"$orphans component labels have no kept row")
      // The fixture must actually exercise the removal path.
      assert(got.filter(!$"keep").count() > 0,
        "fixture produced no semantic duplicates — vacuous test")
    } finally got.unpersist()
  }

  test("sample_reservoir: distributed top-k equals a full global sort") {
    val got = q("sample_reservoir").cache()
    try {
      // Independent recomputation: full sort over the same stable
      // hash, ranked, first k — the semantics TakeOrderedAndProject
      // must reproduce without the global sort.
      val want = Tables.load(spark, sf, "documents")
        .withColumn("hk", expr(
          "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)" +
            " AS BIGINT)"))
        .orderBy($"hk", $"doc_id")
        .collect().take(100).zipWithIndex
        .map { case (r, i) =>
          (i + 1L, r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
           r.getAs[String]("source"), r.getAs[Long]("n_chars"))
        }.toSeq.toDF("rk", "doc_id", "lang", "source", "n_chars")
      assertSameRows(got, want, "sample_reservoir")
      // Ranks are exactly 1..k with no gaps.
      assert(got.agg(min($"rk"), max($"rk"), count(lit(1))).head() ==
        org.apache.spark.sql.Row(1L, 100L, 100L))
    } finally got.unpersist()
  }

  test("mm_dedup: Manku-blocked components equal brute-force components") {
    val got = q("mm_dedup").cache()
    try {
      // Brute-force reference: ALL O(n²) ahash pairs within Hamming
      // ≤3 (no blocking), then the same component fixpoint. Manku
      // completeness (a ≤3-bit difference cannot touch all 4 blocks)
      // means the blocked edge set is identical, so components are.
      val sig = Tables.load(spark, sf, "documents")
        .filter(length($"text") >= 60)
        .withColumn("b", transform(
          split(substring($"text", 1, 60), ""),
          c => ascii(c).cast("long")))
        .withColumn("sm", expr("aggregate(b, 0L, (a, x) -> a + x)"))
        .withColumn("ahash", expr(
          "aggregate(transform(sequence(1, 60), " +
            "i -> IF(element_at(b, i) * 60 > sm, " +
            "shiftleft(1L, i - 1), 0L)), 0L, (a, x) -> a + x)"))
        .select($"doc_id", $"ahash").cache()
      try {
        val a = sig.select($"doc_id".as("da"), $"ahash".as("ha"))
        val b = sig.select($"doc_id".as("db"), $"ahash".as("hb"))
        val brutePairs = a.crossJoin(b).filter($"da" < $"db")
          .filter(expr("bit_count(ha ^ hb)") <= 3)
          .select($"da", $"db")
        assert(brutePairs.count() > 0, "fixture has no near-dup images")
        val bruteComps = operators.DedupCluster.components(brutePairs)
        val want = sig.select($"doc_id")
          .join(bruteComps, Seq("doc_id"), "left")
          .withColumn("comp", coalesce($"comp", $"doc_id"))
          .withColumn("keep", $"doc_id" === $"comp")
        assertSameRows(got, want, "mm_dedup")
      } finally sig.unpersist()
    } finally got.unpersist()
  }

  test("pipeline_ccnet: terciles are balanced, exhaustive, and ordered") {
    val rows = q("pipeline_ccnet").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("min_score"),
        r.getAs[Long]("max_score")))
    val byLang = rows.groupBy(_._1)
    // Exhaustive: bucket doc counts per lang sum to the scored docs.
    val scored = Tables.load(spark, sf, "documents")
      .filter(size(split(lower($"text"), " ")) >= 2)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, bs) =>
      assert(bs.map(_._3).sum == scored(lang),
        s"$lang: bucket sizes don't sum to scored docs")
      // ntile balance: sizes differ by at most 1.
      assert(bs.map(_._3).max - bs.map(_._3).min <= 1,
        s"$lang: terciles unbalanced: $bs")
      // Score ordering: every head score >= every middle score >=
      // every tail score (desc ntile ordering).
      val m = bs.map(b => b._2 -> (b._4, b._5)).toMap
      assert(m("head")._1 >= m("middle")._2, s"$lang head/middle order")
      assert(m("middle")._1 >= m("tail")._2, s"$lang middle/tail order")
    }
    assert(byLang.nonEmpty && byLang.forall(_._2.length == 3),
      "every lang must have exactly 3 buckets")
  }

  test("curate_mix_apply: weights agree with curate_domain_mix and the " +
       "realized thinning tracks them") {
    val applied = q("curate_mix_apply").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
         r.getAs[Long]("weight_ppm"))).toMap
    val mix = q("curate_domain_mix").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("weight_ppm"))
      .toMap
    assert(applied.keySet == mix.keySet, "source sets must agree")
    applied.foreach { case (src, (n, kept, w)) =>
      // Cross-key consistency: both keys derive the SAME capped weight
      // from the same aggregate — drift here means the apply step
      // thins against a different mix than the audit reports.
      assert(w == mix(src), s"$src: weight drift apply=$w audit=${mix(src)}")
      assert(kept <= n, s"$src: kept exceeds population")
      // Realized Bernoulli(w ppm) fraction within 4 sigma.
      val p = w / 1e6
      val sigma = math.sqrt(n * p * (1 - p))
      assert(math.abs(kept - n * p) <= 4 * sigma + 1,
        s"$src: kept=$kept far from expected ${n * p} (sigma=$sigma)")
    }
    // Determinism: a second run must produce identical rows (stable
    // hash, never rand()).
    assertSameRows(q("curate_mix_apply"), q("curate_mix_apply"),
      "curate_mix_apply determinism")
  }

  test("curate_domain_mix: cap algebra and mass accounting") {
    val rows = q("curate_domain_mix").collect()
    val total = rows.map(_.getAs[Long]("src_tokens")).sum
    rows.foreach { r =>
      val (src, share, w, kept) = (r.getAs[Long]("src_tokens"),
        r.getAs[Long]("share_ppm"), r.getAs[Long]("weight_ppm"),
        r.getAs[Long]("kept_tokens"))
      assert(w >= 1 && w <= 1000000L, s"weight_ppm out of range: $w")
      assert(kept <= src, "kept mass cannot exceed source mass")
      // Exact floor-div identities against the independent total.
      assert(share == src * 1000000L / total, "share_ppm identity")
      assert(w == math.min(1000000L, 50000L * total / src),
        "weight_ppm identity")
      assert(kept == src * w / 1000000L, "kept_tokens identity")
      // The cap binds exactly when the source exceeds 5% of the mix.
      assert((w < 1000000L) == (src * 20L > total),
        s"cap bind mismatch for source ${r.getAs[String]("source")}")
    }
    // Both LEAST branches must be live on the fixture.
    val nCapped = rows.count(_.getAs[Long]("weight_ppm") < 1000000L)
    assert(nCapped > 0 && nCapped < rows.length,
      s"cap exercise is vacuous: $nCapped/${rows.length} capped")
  }
}
