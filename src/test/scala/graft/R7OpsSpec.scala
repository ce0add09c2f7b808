package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Laws for the r7 additions: ts_ewma, ts_lagcorr, sketch_bloom,
  * cdc_apply, mm_framesample. Cross-engine equality is the DuckDB
  * oracle's job (all five are oracled); these pin the SEMANTICS the
  * hash can't see — bounds, no-false-negative guarantees, precedence
  * rules, and frame geometry.
  */
class R7OpsSpec extends SparkTestBase {

  import spark.implicits._

  private def q(key: String) = SparkEntry.queries(key)(spark, sf)

  test("ts_ewma: convex bounds and first-observation identity") {
    val r = q("ts_ewma").cache()
    val e = Tables.load(spark, sf, "events")
    // EWMA is a convex combination of the user's own values, so it
    // must lie inside the user's [min, max] value envelope.
    val env = e.groupBy($"user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    assert(r.join(env, "user_id")
      .filter($"ewma" < $"lo" - 1e-9 || $"ewma" > $"hi" + 1e-9)
      .count() == 0, "ewma escapes the user's value envelope")
    // A user's chronologically-first event has only one tap: ewma ==
    // its own value (to cent precision — the one descale division).
    val first = e
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
          .orderBy(unix_timestamp(date_trunc("second", $"ts")),
            $"event_id")))
      .filter($"rn" === 1).select($"event_id")
    assert(r.join(first, "event_id")
      .filter(abs($"ewma" - $"value") > 1e-9).count() == 0,
      "first observation must equal its own EWMA")
    r.unpersist()
  }

  test("ts_lagcorr: three lags, each a valid Pearson r") {
    val rows = q("ts_lagcorr").collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == Seq(0L, 1L, 2L))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bins") >= 2, "needs >= 2 joined bins")
      val c = r.getAs[Double]("corr")
      assert(!c.isNaN && math.abs(c) <= 1.0 + 1e-9,
        s"lag ${r.getAs[Long]("lag")}: corr $c outside [-1, 1]")
    }
  }

  test("sketch_bloom: no false negatives, bounded false positives") {
    val rows = q("sketch_bloom").collect()
    assert(rows.length == 5, "one row per event type")
    // True members among the 200 probes, per type (all fixture user
    // ids are < 200, so every member is probed).
    val members = Tables.load(spark, sf, "events")
      .filter($"user_id" >= 0 && $"user_id" < 200)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val cand = r.getAs[Long]("n_candidates")
      assert(cand >= members(t),
        s"$t: a true member was rejected (bloom false negative)")
      assert(cand - members(t) <= 5,
        s"$t: ${cand - members(t)} false positives — expected ~0 at " +
          "13% fill with k=4")
      assert(r.getAs[Long]("bits_set") <= 4096, s"$t: m overflow")
    }
  }

  test("sketch_bloom: sharded insert merges to the unsharded state") {
    // The set-bit relation is a distinct union, so inserting in two
    // shards and OR-merging (union) must equal one-shot construction —
    // the idempotent-merge property that makes the filter safe to
    // build incrementally (re-processed shards can't corrupt it).
    def posOf(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_type", explode(array((0 until 4).map { i =>
        pmod(expr(s"CAST(conv(substr(md5(CAST(user_id AS STRING) " +
          s"|| ':$i'), 1, 8), 16, 10) AS BIGINT)"), lit(4096L))
      }: _*)).as("pos")).distinct()
    val ins = Tables.load(spark, sf, "events")
      .select($"event_type", $"user_id").distinct()
    val whole = posOf(ins)
    val sharded = posOf(ins.filter($"user_id" % 2 === 0))
      .union(posOf(ins.filter($"user_id" % 2 === 1))).distinct()
    assertSameRows(sharded, whole, "bloom shard merge")
  }

  test("cdc_apply: precedence — deletes drop, upserts win, rest keep") {
    val r = q("cdc_apply").cache()
    val base = Tables.load(spark, sf, "customer")
    val nBase = base.count()
    val nDel = base.filter($"c_custkey" % 10 === 7).count()
    assert(r.count() == nBase - nDel + 50, "row accounting")
    // Insert base is 10^9 since r11 (a 10^6 base collided with the
    // ScaleBench replica key offset — see the query's comment).
    assert(r.filter($"c_custkey" % 10 === 7 && $"c_custkey" < 1000000000L)
      .count() == 0, "deleted keys must not survive")
    val inserted = r.filter($"c_custkey" >= 1000000000L).cache()
    assert(inserted.count() == 50, "all inserts present")
    assert(inserted.filter($"seg" =!= "NEWSEG" ||
      abs($"bal" - ($"c_custkey" - 1000000000L).cast(DoubleType) - 0.25)
        > 1e-9).count() == 0, "insert payload")
    val joined = r.join(base, "c_custkey")
    assert(joined.filter($"c_custkey" % 10 === 3 &&
      abs($"bal" - $"c_acctbal" - 100.0) > 1e-9).count() == 0,
      "updates add exactly 100.00")
    assert(joined.filter($"c_custkey" % 10 =!= 3 &&
      ($"bal" =!= $"c_acctbal" || $"seg" =!= $"c_mktsegment"))
      .count() == 0, "untouched rows pass through unchanged")
    inserted.unpersist(); r.unpersist()
  }

  test("text_lmscore: probability bounds and bigram accounting") {
    val r = q("text_lmscore").cache()
    val docs = Tables.load(spark, sf, "documents")
    assert(r.count() == docs.count(), "every document scored")
    // c2 <= c1 always (a bigram can't outnumber its head's bigrams),
    // so every per-bigram surrogate — and the integer mean — lies in
    // (0, 10^6]; a degenerate one-bigram doc hits exactly 10^6 only
    // if its head word is unique.
    assert(r.filter($"lm_score" <= 0 || $"lm_score" > 1000000L)
      .count() == 0, "score outside (0, 1e6]")
    // n_bigrams = token count - 1 (no filtering, consecutive pairs).
    val want = docs.select($"doc_id",
      (size(split(lower($"text"), " ")) - 1).cast("long").as("nb"))
    assert(r.join(want, "doc_id").filter($"n_bigrams" =!= $"nb")
      .count() == 0, "bigram accounting")
    r.unpersist()
  }

  test("graph_pagerank: mass conservation, coverage, degree ordering") {
    val r = q("graph_pagerank").cache()
    val li = Tables.load(spark, sf, "lineitem")
    val nParts = li.select($"l_partkey").distinct().count()
    val nSupps = li.select($"l_suppkey").distinct().count()
    assert(r.count() == nParts + nSupps, "every touched node is ranked")
    // Integer truncation only LEAKS mass — total stays in
    // (0.5·mass, mass]; ranks strictly positive (teleport floor).
    val total = r.agg(sum($"rank")).head().getLong(0)
    assert(total <= operators.GraphQueries.prMass, "mass created")
    assert(total > operators.GraphQueries.prMass / 2, "mass collapsed")
    assert(r.filter($"rank" <= 0).count() == 0, "non-positive rank")
    // Suppliers aggregate far more edges than parts in this bipartite
    // graph — their mean rank must dominate.
    val mean = r.groupBy($"node_type")
      .agg(avg($"rank")).collect()
      .map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(mean("supplier") > mean("part"),
      "high-degree side must out-rank")
    r.unpersist()
  }

  test("mm_framesample: frame geometry and digest fidelity") {
    val r = q("mm_framesample").cache()
    // Sampled frames respect the stride and stay inside the payload.
    assert(r.filter($"frame_idx" % $"stride" =!= 0).count() == 0,
      "off-stride frame sampled")
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id",
        octet_length($"text".cast(BinaryType)).cast(LongType)
          .as("bytes"))
    assert(r.join(docs, "doc_id")
      .filter($"byte_off" + 32 > $"bytes").count() == 0,
      "sampled frame exceeds the payload")
    // Per-doc sample count: ceil(n_frames / stride).
    val perDoc = r.groupBy($"doc_id", $"n_frames", $"stride")
      .agg(count(lit(1)).as("k"))
    assert(perDoc.filter(
      $"k" =!= (($"n_frames" + $"stride" - 1L) / $"stride")
        .cast(LongType)).count() == 0, "sample count per doc")
    // Frame-0 digest equals an independently computed head digest.
    val head = Tables.load(spark, sf, "documents")
      .select($"doc_id",
        md5(expr("substring(CAST(text AS BINARY), 1, 32)")).as("want"))
    assert(r.filter($"frame_idx" === 0).join(head, "doc_id")
      .filter($"frame_md5" =!= $"want").count() == 0,
      "frame-0 digest mismatch")
    r.unpersist()
  }
}
