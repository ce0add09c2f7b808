package graft

import org.apache.spark.sql.functions._

/** Laws for the r11d additions. All keys are DuckDB-oracled; these pin
  * the semantics the cross-engine hash can't see — the point-in-time
  * lookup's non-anticipation (every fact sees exactly the dimension
  * version that was current at ITS OWN timestamp, proven against a
  * brute-force latest-purchase-before lookup), and the weighted
  * median's defining inequality (proven against a sequential replay
  * over the collected distribution).
  */
class R11dOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def q(key: String) = SparkEntry.queries(key)(spark, sf)

  test("dim_lookup_pit: accounts for every view; tiers well-formed") {
    val got = q("dim_lookup_pit").cache()
    try {
      val views = Tables.load(spark, sf, "events")
        .filter($"event_type" === "view").count()
      val summed = got.agg(sum($"n_views")).head().getLong(0)
      assert(summed == views,
        s"n_views sums to $summed but the corpus has $views view events")
      val tiers = got.select($"tier").collect().map(_.getString(0)).toSet
      assert(tiers.subsetOf(Set("none", "low", "mid", "high")),
        s"unexpected tier labels: $tiers")
      assert(tiers.contains("none"),
        "no 'none' tier — the pre-first-purchase left-join branch is " +
          "vacuous at this fixture; the law would not cover it")
    } finally got.unpersist()
  }

  test("dim_lookup_pit: as-of == brute-force latest-purchase-before") {
    // The SCD2 interval lookup must equal the direct definition: a
    // view's tier is the tier of the user's latest purchase at or
    // before the view (ties broken by event_id, the build's window
    // order), 'none' when no such purchase exists.
    val ev = Tables.load(spark, sf, "events")
      .select($"user_id", unix_micros($"ts").as("ts_us"), $"event_id",
        $"event_type", $"value")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id".as("uid"), $"ts_us".as("vts"),
        $"value".as("vvalue"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("uid"), $"ts_us".as("pts"), $"event_id",
        when($"value" < 100, "low").when($"value" < 500, "mid")
          .otherwise("high").as("ptier"))
    val want = views.join(purchases.withColumnRenamed("uid", "puid"),
        $"uid" === $"puid" && $"pts" <= $"vts", "left_outer")
      .groupBy($"uid", $"vts", $"vvalue")
      .agg(max_by($"ptier", struct($"pts", $"event_id")).as("tier0"))
      .select(coalesce($"tier0", lit("none")).as("tier"), $"uid",
        $"vvalue")
      .groupBy($"tier")
      .agg(count(lit(1)).as("n_views"),
        countDistinct($"uid").as("n_users"),
        Det.dsum($"vvalue").as("sum_value"))
    assertSameRows(q("dim_lookup_pit"), want, "pit-vs-bruteforce")
  }

  test("agg_path_ngrams: accounting + ordering") {
    val got = q("agg_path_ngrams").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 10, "expected top-10 paths")
    assert(got.forall { case (_, n, nu) => nu >= 1 && nu <= n },
      "n_users outside [1, n]")
    assert(got.zip(got.tail).forall { case (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1) },
      "top-10 not in (n desc, path) order")
    // Full-distribution accounting: total 3-gram instances equal
    // Σ max(0, user_events − 2).
    val perUser = Tables.load(spark, sf, "events")
      .groupBy($"user_id").count().collect().map(_.getLong(1))
    val totalGrams = perUser.map(n => math.max(0L, n - 2)).sum
    val allPaths = Tables.load(spark, sf, "events")
      .select($"user_id", $"event_id", $"event_type",
        expr("unix_micros(ts)").as("tus"))
      .withColumn("e2", lead($"event_type", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"tus", $"event_id")))
      .withColumn("e3", lead($"event_type", 2).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"tus", $"event_id")))
      .filter($"e3".isNotNull).count()
    assert(allPaths == totalGrams,
      s"3-gram instance count $allPaths != per-user sum $totalGrams")
  }

  test("agg_ab_test: proportions algebra and sign consistency") {
    // sf0.01 (150 users, ~75/arm): the tier where both arms are
    // non-degenerate; sf0.001's 7-8-user arms can legitimately have
    // zero first-event purchases.
    val r = SparkEntry.queries("agg_ab_test")(
      spark, "/root/testdata/sf0.01").head()
    val (na, ca, nb, cb) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))
    val (ra, rb, z) = (r.getLong(4), r.getLong(5), r.getDouble(6))
    val users = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .select($"user_id").distinct().count()
    assert(na + nb == users, "arms don't partition the users")
    assert(ca <= na && cb <= nb, "conversions exceed arm size")
    assert(ca > 0 && cb > 0 && ca < na && cb < nb,
      "a degenerate arm (0% or 100%) — the statistic is vacuous")
    assert(ra == ca * 1000000L / na && rb == cb * 1000000L / nb)
    assert((z > 0) == (ca.toDouble / na > cb.toDouble / nb) ||
      z == 0.0, "z sign disagrees with the rate difference")
    assert(math.abs(z) < 10.0, s"implausible z for an A/A split: $z")
  }

  test("text_vocab_growth: cumulative identity and closure") {
    val got = q("text_vocab_growth").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length >= 3, "degenerate curve (fewer than 3 batches)")
    var cum = 0L
    got.foreach { case (_, nu, vs) =>
      assert(nu > 0); cum += nu
      assert(vs == cum, "vocab_size != running sum of new_units")
    }
    val distinctBigrams = Tables.load(spark, sf, "documents")
      .select($"doc_id", split(lower($"text"), " ").as("t"))
      .filter(size($"t") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .as("bg")).distinct().count()
    assert(got.last._3 == distinctBigrams,
      "final vocab_size != distinct bigram count")
  }

  test("curate_mix_temperature: flattening + normalization algebra") {
    val got = q("curate_mix_temperature").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(got.length == 20, "expected 20 sources")
    val shares = got.map(_._2); val t2 = got.map(_._3)
    // Weights normalize to ~1e6 (floor losses bounded by n sources).
    val sum2 = t2.sum
    assert(sum2 <= 1000000L && sum2 > 1000000L - got.length,
      s"t2 weights sum to $sum2, not ~1e6")
    // Flattening: the extreme ratio strictly shrinks (cross-
    // multiplied, no division).
    assert(t2.max * shares.min < shares.max * t2.min,
      "temperature did not flatten the share distribution")
    // Order preserved: bigger share never gets a smaller weight.
    val byShare = got.sortBy(_._2)
    assert(byShare.zip(byShare.tail).forall { case (a, b) =>
      a._3 <= b._3 }, "t2 weights not monotone in share")
  }

  test("ts_rolling_median: sequential replay + robustness vs mean") {
    val rows = Tables.load(spark, sf, "events")
      .select($"user_id", $"event_id", expr("unix_micros(ts)"),
        (Det.money($"value") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
      val sorted = rs.sortBy(t => (t._3, t._2))
      sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - 19), i + 1).map(_._4)
          .sorted
        (sorted(i)._2, frame((frame.length + 1) / 2 - 1),
          frame.length.toLong)
      }
    }.toSeq.sortBy(_._1)
    val got = q("ts_rolling_median").select($"event_id", $"roll_med",
        $"n_window").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == want, "rolling median differs from replay")
    // Frames really slide: windows reach the full 20 readings.
    assert(got.exists(_._3 == 20L), "no full-width frame at sf0.001")
  }

  test("agg_active_users: DAU <= WAU <= MAU and exact W1 identity") {
    val got = q("agg_active_users").cache()
    try {
      assert(got.count() >= 25, "too few days")
      assert(got.filter($"dau" > $"wau" || $"wau" > $"mau")
        .count() == 0, "DAU <= WAU <= MAU violated")
      // First observed day: its trailing windows contain only itself.
      val first = got.orderBy($"day").head()
      assert(first.getLong(1) == first.getLong(2) &&
        first.getLong(2) == first.getLong(3),
        "first day's trailing windows must equal its DAU")
      // WAU must genuinely exceed DAU somewhere (the window bites).
      assert(got.filter($"wau" > $"dau").count() > 0,
        "WAU never exceeds DAU — sliding window vacuous")
    } finally got.unpersist()
  }

  test("text_bpe_merges: reference replay incl. overlapping pairs") {
    import operators.TrainQueries.bpeRounds
    // Driver-side reference BPE on the same word-frequency dict.
    val freqs = Tables.load(spark, sf, "documents")
      .select(explode(split(lower($"text"), " ")).as("term"))
      .filter($"term" =!= "" && !$"term".contains("|"))
      .groupBy($"term").agg(count(lit(1)).as("freq")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    def mergeWord(syms: Vector[String], a: String, b: String)
        : Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    var words = freqs.map { case (t, f) =>
      (t.toVector.map(_.toString), f) }.toVector
    val wantMerges = (1 to bpeRounds).map { r =>
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f }
      }
      val ((a, b), n) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, x, y) }
      words = words.map { case (s2, f) => (mergeWord(s2, a, b), f) }
      (r.toLong, a, b, n)
    }
    val got = q("text_bpe_merges").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq
    assert(got == wantMerges,
      s"merge table differs from reference BPE:\n got  $got\n want $wantMerges")
    // The overlapping-pair semantics specifically: greedy
    // left-to-right on 'a a a a a' yields 'aa aa a'.
    val df = Seq(("a|a|a|a|a", 1L)).toDF("st", "freq")
      .withColumn("ma", lit("a")).withColumn("mb", lit("a"))
    val folded = df.selectExpr(
      """CASE WHEN size(split(st, '\\|')) < 2 THEN st
        |ELSE aggregate(
        |  slice(split(st, '\\|'), 2, size(split(st, '\\|')) - 1),
        |  element_at(split(st, '\\|'), 1),
        |  (acc, x) -> CASE
        |    WHEN acc = ma AND x = mb THEN concat(acc, x)
        |    WHEN endswith(acc, concat('|', ma)) AND x = mb
        |      THEN concat(substr(acc, 1, length(acc) - length(ma) - 1),
        |                  '|', ma, mb)
        |    ELSE concat(acc, '|', x) END) END AS st""".stripMargin)
      .head().getString(0)
    assert(folded == "aa|aa|a",
      s"overlap fold wrong: got $folded, want aa|aa|a")
  }

  test("join_spatial_grid: complete vs brute force; gate tight") {
    val pts = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)(0).toDouble,
        r.getSeq[Float](1)(1).toDouble))
    val want = (for {
      (ia, xa, ya) <- pts; (ib, xb, yb) <- pts
      if ia < ib &&
        (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) <= 0.0025
    } yield (ia, ib)).toSet
    val got = q("join_spatial_grid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"grid join pairs differ from brute force: missing " +
        s"${(want -- got).take(3)}, extra ${(got -- want).take(3)}")
    assert(want.nonEmpty, "no pairs within r — gate vacuous")
    // The grid must also genuinely prune: candidate pairs should be
    // far below the all-pairs count (else the bucketing is dead).
    assert(want.size < pts.length.toLong * (pts.length - 1) / 8,
      "radius keeps >25% of all pairs — fixture too dense to prove " +
        "the grid prunes")
  }

  test("sample_weighted: exact k and weight pressure") {
    val got = q("sample_weighted").cache()
    try {
      assert(got.count() == 100, "weighted sample must keep exactly k")
      val selMean = got.agg(avg($"n_chars")).head().getDouble(0)
      val corpusMean = Tables.load(spark, sf, "documents")
        .agg(avg($"n_chars")).head().getDouble(0)
      assert(selMean > corpusMean,
        f"selection pressure missing: selected mean $selMean%.1f <= " +
          f"corpus mean $corpusMean%.1f")
      // Ranks are a clean 1..k permutation.
      assert(got.agg(min($"rk"), max($"rk"),
        countDistinct($"rk")).head().toSeq == Seq(1L, 100L, 100L))
    } finally got.unpersist()
  }

  test("text_decontaminate: accounting + consistency with detection") {
    // sf0.1: the tier where the 5-gram overlap relation is dense
    // enough that the threshold actually drops docs.
    val dir = "/root/testdata/sf0.1"
    val got = SparkEntry.queries("text_decontaminate")(spark, dir).cache()
    try {
      val corp = Tables.load(spark, dir, "documents")
        .filter($"source" =!= "src0")
      assert(got.agg(sum($"n_docs")).head().getLong(0) == corp.count(),
        "audit doesn't account for every non-benchmark doc")
      assert(got.filter($"n_kept" + $"n_dropped" =!= $"n_docs")
        .count() == 0, "kept + dropped != total in some source")
      val dropped = got.agg(sum($"n_dropped")).head().getLong(0)
      val flagged = SparkEntry.queries("text_contamination")(spark, dir)
        .filter($"n_hits" >= 3).count()
      assert(dropped == flagged,
        s"action dropped $dropped but detection flags $flagged")
      assert(dropped > 0,
        "threshold drops nothing at sf0.1 — the action is vacuous")
    } finally got.unpersist()
  }

  test("agg_cohort_retention: matrix shape and retention algebra") {
    val got = q("agg_cohort_retention").cache()
    try {
      assert(got.select($"cd").distinct().count() >= 2,
        "single cohort — the matrix is degenerate at this fixture")
      assert(got.select($"offset").distinct().count() >= 5,
        "fewer than 5 offsets — the time axis is degenerate")
      assert(got.filter($"offset" === 0 && $"ret_ppm" =!= 1000000L)
        .count() == 0, "offset-0 retention must be exactly 1e6 ppm")
      assert(got.filter($"n_users" > $"cohort_n").count() == 0,
        "a cell retains more users than its cohort holds")
      assert(got.filter($"offset" < 0).count() == 0,
        "pre-signup activity leaked into the matrix")
      // Every cohort has its offset-0 row (the join base).
      val missing = got.groupBy($"cd")
        .agg(min($"offset").as("m")).filter($"m" =!= 0).count()
      assert(missing == 0, "a cohort lacks its offset-0 row")
    } finally got.unpersist()
  }

  test("funnel_window: stage monotonicity and window bound") {
    val r = q("funnel_window").head()
    val (nv, nc, np) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (cg, pg) = (r.getLong(3), r.getLong(4))
    assert(nv >= nc && nc >= np, "funnel stages must shrink")
    assert(nc > 0 && np > 0, "windowed funnel empty — vacuous bound")
    val W = 172800000000L
    assert(cg > 0 && cg <= nc * W, "click gap mass outside (0, n*W]")
    assert(pg > 0 && pg <= np * W, "purchase gap mass outside (0, n*W]")
    // The bound only ever removes conversions vs the unbounded form.
    val unbounded = SparkEntry.queries("funnel_steps")(spark, sf)
      .agg(count(lit(1)),
        sum(when($"t_click".isNotNull, 1L).otherwise(0L))).head()
    assert(nv == unbounded.getLong(0), "view stage must match")
    assert(nc <= unbounded.getLong(1),
      "windowed clicks exceed unbounded first-clicks")
  }

  test("vec_rerank_mmr: exact greedy replay + diversification bites") {
    import operators.LlmQueries.{mmrShort, mmrPicks}
    val vecs = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s0 = 0.0; var i = 0
      while (i < a.length) { s0 += a(i).toDouble * b(i).toDouble; i += 1 }
      s0
    }
    def norm2(a: Array[Float]): Double = dot(a, a)
    val queries = vecs.keys.filter(_ < 10).toSeq.sorted
    val replay = queries.flatMap { q =>
      val qv = vecs(q)
      val rel = vecs.toSeq.filter(_._1 != q).map { case (c, cv) =>
        c -> dot(qv, cv) / math.sqrt(norm2(qv) * norm2(cv))
      }
      val short = rel.sortBy { case (c, r) => (-r, c) }.take(mmrShort)
      val relMap = short.toMap
      var selected = Vector.empty[(Long, Long, Long, Double)]
      var chosen = Set.empty[Long]
      for (p <- 1 to mmrPicks) {
        val cands = short.filterNot { case (c, _) => chosen(c) }
        val scored = cands.map { case (c, r) =>
          val ms = if (chosen.isEmpty) 0.0
            else chosen.map(s0 => dot(vecs(c), vecs(s0)) /
              math.sqrt(norm2(vecs(c)) * norm2(vecs(s0)))).max
          c -> (if (chosen.isEmpty) r * 0.7 else r * 0.7 - ms * 0.3)
        }
        val (c, sc) = scored.minBy { case (cd, s0) => (-s0, cd) }
        selected :+= ((q, p.toLong, c,
          BigDecimal(sc).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
        chosen += c
      }
      assert(relMap.nonEmpty)
      selected
    }
    val got = q("vec_rerank_mmr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got.map(t => (t._1, t._2, t._3)) ==
      replay.map(t => (t._1, t._2, t._3)),
      "MMR picks differ from the exact greedy replay")
    got.zip(replay).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) < 2e-6,
        s"score drift at ${g._1}/${g._2}: ${g._4} vs ${w._4}")
    }
    // Diversification must actually bite somewhere: at least one
    // query's pick list deviates from the pure-relevance order.
    val knn = SparkEntry.queries("vec_knn")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val deviates = got.filter(_._2 >= 2).exists { case (q0, p, c, _) =>
      knn.get((q0, p)).exists(_ != c)
    }
    assert(deviates,
      "every MMR list equals the raw top-k — diversification vacuous")
  }

  test("agg_incremental: cut-invariance and non-vacuous cutoff") {
    import org.apache.spark.sql.Column
    def partial(pred: Column) =
      Tables.load(spark, sf, "events").filter(pred)
        .select($"event_type",
          expr("unix_micros(ts) div 86400000000").as("day"),
          Det.centsLong(Det.money($"value"), 100, "cents"), $"event_id")
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
          min($"event_id").as("min_id"), max($"event_id").as("max_id"))
    def mergedAt(cut: String) = {
      val t = java.time.Instant.parse(cut)
      val h = partial($"ts" < lit(t))
      val d = partial($"ts" >= lit(t))
      assert(h.count() > 0 && d.count() > 0,
        s"cutoff $cut leaves an empty side — the merge is vacuous")
      h.unionByName(d).groupBy($"event_type", $"day")
        .agg(sum($"n").as("n"), sum($"sum_cents").as("sum_cents"),
          min($"min_id").as("min_id"), max($"max_id").as("max_id"))
    }
    // Any cutoff merges to the same view — the mergeable-state
    // property that makes the MV maintainable at all.
    val a = mergedAt("2024-01-16T00:00:00Z")
    val b = mergedAt("2024-01-05T12:00:00Z")
    assertSameRows(a, b, "cut-invariance")
    assertSameRows(q("agg_incremental"),
      a.orderBy($"event_type", $"day"), "key-vs-inline")
  }

  test("sketch_bitmap_ops: algebra bounds + in-engine ground truth") {
    val got = q("sketch_bitmap_ops").cache()
    try {
      assert(got.count() == 10, "expected 10 type pairs")
      assert(got.filter($"n_inter" > least($"na", $"nb") ||
        $"n_union" < greatest($"na", $"nb") ||
        $"n_union" > $"na" + $"nb").count() == 0,
        "set-algebra bounds violated")
      // Ground truth recomputed in-engine with plain distincts.
      val a = Tables.load(spark, sf, "events")
        .select($"event_type", $"user_id").distinct().cache()
      val c = a.groupBy($"event_type").agg(count(lit(1)).as("n"))
      val prs = c.select($"event_type".as("ta"), $"n".as("na"))
        .join(c.select($"event_type".as("tb"), $"n".as("nb")),
          $"ta" < $"tb")
      val inter = a.select($"event_type".as("ta"), $"user_id")
        .join(a.select($"event_type".as("tb"), $"user_id"),
          Seq("user_id")).filter($"ta" < $"tb")
        .groupBy($"ta", $"tb").agg(count(lit(1)).as("n_inter"))
      val want = prs.join(inter, Seq("ta", "tb"))
        .select($"ta", $"tb", $"na", $"nb",
          ($"na" + $"nb" - $"n_inter").as("n_union"), $"n_inter",
          expr("(n_inter) * 1000000 div (na + nb - n_inter)")
            .as("jacc_ppm"))
      assertSameRows(got, want, "bitmap-vs-distinct")
      a.unpersist()
    } finally got.unpersist()
  }

  test("curate_shard: accounting, reshard stability, order-sensitive sum") {
    val got = q("curate_shard").cache()
    try {
      val docs = Tables.load(spark, sf, "documents")
      assert(got.count() == 16, "not all 16 shards present")
      val Array(nd, sc) = got.agg(sum($"n_docs"), sum($"sum_chars"))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      assert(nd == docs.count(), "shard doc counts don't sum to corpus")
      assert(sc == docs.agg(sum($"n_chars")).head().getLong(0),
        "shard char mass doesn't sum to corpus")
      // Reshard stability: the assignment/order must not depend on
      // input partitioning (the whole point of hash order vs rand()).
      val docs2 = docs.repartition(7, $"lang")
      val got2 = docs2
        .select($"doc_id", $"n_chars",
          md5(concat(lit("shard:"), $"doc_id".cast("string"))).as("hkey"))
        .withColumn("shard", expr(
          "CAST(conv(substr(hkey, 1, 4), 16, 10) AS BIGINT) % 16"))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"shard").orderBy($"hkey", $"doc_id")))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"),
          sum(expr("CAST(conv(substr(md5(concat(CAST(pos AS STRING)," +
            " ':', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"))
            .as("order_sum"))
      assertSameRows(got, got2.orderBy($"shard"), "reshard-stability")
      // The checksum must actually SEE order: reversing the
      // within-shard order must change it (else the order proof is
      // vacuous — a membership digest in disguise).
      val rev = docs
        .select($"doc_id",
          md5(concat(lit("shard:"), $"doc_id".cast("string"))).as("hkey"))
        .withColumn("shard", expr(
          "CAST(conv(substr(hkey, 1, 4), 16, 10) AS BIGINT) % 16"))
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"shard").orderBy($"hkey".desc, $"doc_id".desc)))
        .groupBy($"shard")
        .agg(sum(expr("CAST(conv(substr(md5(concat(CAST(pos AS STRING)," +
          " ':', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)"))
          .as("order_sum"))
      val fwd = got.select($"shard", $"order_sum")
      val differing = fwd.join(rev.withColumnRenamed("order_sum", "r"),
        "shard").filter($"order_sum" === $"r").count()
      assert(differing < 16,
        "reversed order produced identical checksums on every shard")
    } finally got.unpersist()
  }

  test("sink_compaction_plan: sequential replay + bin shape") {
    val got = q("sink_compaction_plan").cache()
    try {
      val docs = Tables.load(spark, sf, "documents")
        .select($"source", $"doc_id", $"n_chars").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.agg(sum($"n_docs")).head().getLong(0) == docs.length,
        "bin doc counts don't sum to corpus")
      // Greedy replay: walk each source in doc_id order, bin =
      // floor(running-prior / target).
      val assigned: Seq[(String, Long, Long, Long)] =
        docs.groupBy(_._1).toSeq.flatMap { case (src, rs) =>
          var prior = 0L
          rs.sortBy(_._2).map { case (_, id, ch) =>
            val bin = prior / 2000L
            prior += ch
            (src, bin, id, ch)
          }.toSeq
        }
      val want = assigned.groupBy(t => (t._1, t._2)).toSeq
        .map { case ((src, bin), xs) =>
          (src, bin, xs.size.toLong, xs.map(_._4).sum,
            xs.map(_._3).min, xs.map(_._3).max)
        }.sortBy(x => (x._1, x._2))
      val gotRows = got.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(gotRows == want, "compaction plan differs from replay")
      // Bins are contiguous from 0 per source, and the planner is
      // non-vacuous (some source actually needs >1 file).
      val shape = got.groupBy($"source")
        .agg(min($"bin").as("mn"), max($"bin").as("mx"),
          countDistinct($"bin").as("nb"))
      assert(shape.filter($"mn" =!= 0 || $"nb" =!= $"mx" + 1)
        .count() == 0, "bins not contiguous from 0")
      assert(shape.filter($"nb" > 1).count() > 0,
        "every source fits one bin — target vacuous at this fixture")
    } finally got.unpersist()
  }

  test("graph_assortativity: symmetry self-check + bounds + replay") {
    val r = q("graph_assortativity").head()
    val (n, sx, sy, ar) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))
    assert(sx == sy, "doubled-edge symmetry broken: sum x != sum y")
    assert(ar >= -1.0 && ar <= 1.0, s"correlation out of [-1,1]: $ar")
    // Exact driver replay over the collected edge relation.
    val edges = Tables.load(spark, sf, "lineitem")
      .select($"l_partkey".as("p"), ($"l_suppkey" + 1000000000L).as("s2"))
      .distinct().collect().map(r2 => (r2.getLong(0), r2.getLong(1)))
    val doubled = edges ++ edges.map { case (a, b) => (b, a) }
    val deg = doubled.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xs = doubled.map { case (a, b) => (deg(a), deg(b)) }
    assert(n == doubled.length.toLong)
    val (nn, sxr, syr) = (xs.length.toDouble,
      xs.map(_._1).sum.toDouble, xs.map(_._2).sum.toDouble)
    val sxy = xs.map { case (x, y) => x * y }.sum.toDouble
    val sxx = xs.map(t => t._1 * t._1).sum.toDouble
    val syy = xs.map(t => t._2 * t._2).sum.toDouble
    val want = (nn * sxy - sxr * syr) /
      (math.sqrt(nn * sxx - sxr * sxr) * math.sqrt(nn * syy - syr * syr))
    assert(math.abs(ar - want) < 1e-9,
      s"assortativity $ar differs from replay $want")
    // The bipartite part↔supplier graph is strongly DISASSORTATIVE
    // by construction (every edge joins a high-degree supplier to a
    // low-degree part) — the sign is part of the semantics.
    assert(ar < 0, s"bipartite hub-leaf graph not disassortative: $ar")
  }

  test("graph_kcore: fixed rounds reach the fixpoint; peel non-vacuous") {
    import operators.GraphQueries.{kcoreK, kcoreRounds}
    val got = q("graph_kcore").cache()
    try {
      val b = Tables.load(spark, sf, "lineitem")
        .join(Tables.load(spark, sf, "orders"),
          $"l_orderkey" === $"o_orderkey")
        .select($"o_custkey".as("c"), ($"l_partkey" + 2000000000L).as("p"))
        .distinct()
      val ed = b.select($"c".as("src"), $"p".as("dst"))
        .unionByName(b.select($"p".as("src"), $"c".as("dst")))
      // Symmetric-input contract (r13 ADVICE): the decremental peel
      // assumes every dst also appears as a src (undirected doubled
      // relation); a dst-only node would get no degree row and its
      // edges would never decrement, silently diverging from the
      // pre-r13 loop. Law: dst ⊆ src on the keyed query's input.
      assert(ed.select($"dst".as("node")).distinct()
        .join(ed.select($"src".as("node")).distinct(),
          Seq("node"), "left_anti").count() == 0,
        "kcore input not symmetric: some dst never appears as src")
      val total = ed.select($"src").distinct().count()
      val n = got.count()
      assert(n > 0, "empty core — degenerate fixture")
      assert(n < total,
        s"peel removed nothing at $sf (k=$kcoreK is vacuous here)")
      // Fixpoint: one more round changes nothing — the fixed unroll
      // the oracle replays is also the converged core.
      assertSameRows(
        api.Graph.kcore(ed, kcoreK, kcoreRounds + 1),
        got.select($"node", $"deg"), "round4-vs-round5")
      // Core property at the fixpoint: every survivor keeps >= k
      // in-core neighbors.
      assert(got.filter($"deg" < kcoreK).count() == 0,
        s"a core node has degree < $kcoreK at the asserted fixpoint")
      // Brute-force sequential peel over the collected graph.
      var adj = ed.collect().map(r => (r.getLong(0), r.getLong(1)))
      var changed = true
      while (changed) {
        val deg = adj.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= kcoreK).keySet
        val next = adj.filter { case (s2, d) =>
          keep(s2) && keep(d) }
        changed = next.length != adj.length
        adj = next
      }
      val want = adj.groupBy(_._1).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val gotPairs = got.select($"node", $"deg").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(gotPairs == want, "kcore differs from the sequential peel")
    } finally got.unpersist()
  }

  test("sample_split_leakproof: clusters never straddle; naive would") {
    // sf0.1 is the fixture tier with true dup clusters by
    // construction (8 exact-duplicate texts).
    val dir = "/root/testdata/sf0.1"
    val comps = SparkEntry.queries("dedup_minhash_cluster")(spark, dir)
      .filter(!$"canonical").select($"doc_id", $"comp").cache()
    try {
      assert(comps.count() > 0,
        "no non-singleton clusters at sf0.1 — the leak law is vacuous")
      def splitOf(grpCol: org.apache.spark.sql.Column) =
        expr("CAST(conv(substr(md5(concat('lsplit:', CAST(grp AS " +
          "STRING))), 1, 4), 16, 10) AS BIGINT) % 100")
      // Cluster-keyed split: every member of a component gets its
      // canonical label's bucket — by construction AND verified.
      val docs = Tables.load(spark, dir, "documents").select($"doc_id")
      val withGrp = docs.join(comps, Seq("doc_id"), "left")
        .withColumn("grp", coalesce($"comp", $"doc_id"))
        .withColumn("bucket", splitOf($"grp"))
      val straddling = withGrp.filter($"comp".isNotNull)
        .groupBy($"comp").agg(countDistinct($"bucket").as("nb"))
        .filter($"nb" > 1).count()
      assert(straddling == 0, "a dup cluster straddles split buckets")
      // The op is non-vacuous: the doc-id-keyed naive split WOULD
      // have torn at least one cluster apart (eval leakage).
      val naive = docs.join(comps, Seq("doc_id"))
        .withColumn("grp", $"doc_id")
        .withColumn("bucket", splitOf($"grp"))
        .groupBy($"comp").agg(countDistinct($"bucket").as("nb"))
        .filter($"nb" > 1).count()
      assert(naive > 0,
        "naive split tears no cluster at sf0.1 — the fixture no " +
          "longer demonstrates the leak this op prevents")
    } finally comps.unpersist()
  }

  test("agg_weighted_median: defining inequality + sequential replay") {
    val got = q("agg_weighted_median").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.nonEmpty, "empty weighted-median output")
    val rows = Tables.load(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_quantity".cast("long"),
        (Det.money($"l_extendedprice") * 100).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      val (gm, gp90, gtot) = got(flag)
      val tot = rs.map(_._3).sum
      assert(gtot == tot, s"$flag: w_cents $gtot != exact $tot")
      // Sequential replay of the defining picks over the sorted
      // (quantity, weight-mass) distribution.
      val byQ = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      def pick(mult: Long, frac: Long): Long = {
        var cum = 0L
        byQ.collectFirst {
          case (qv, w) if { cum += w; cum * mult >= tot * frac } => qv
        }.get
      }
      assert(gm == pick(2, 1), s"$flag: median ${gm} != replay")
      assert(gp90 == pick(10, 9), s"$flag: p90 ${gp90} != replay")
      assert(gp90 >= gm, s"$flag: p90 below median")
      // The median really splits the mass: weight at or below the
      // median is >= half, weight strictly below is < half.
      val below = byQ.filter(_._1 < gm).map(_._2).sum
      assert(below * 2 < tot, s"$flag: mass strictly below median " +
        "already >= half — picked value too high")
    }
  }
}
