package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the r7b additions (text_dupspans, sample_split, vec_mips,
  * dim_scd2, win_ntile, agg_corrmatrix). All six are DuckDB-oracled;
  * these pin the semantics the hash can't see — interval algebra,
  * split stability, brute-force agreement, and bound checks.
  */
class CurationWarehouseSpec extends SparkTestBase {

  import spark.implicits._

  private def q(key: String) = SparkEntry.queries(key)(spark, sf)

  test("text_dupspans: byte-identical docs are fully duplicated spans") {
    val r = q("text_dupspans").cache()
    // Counters are consistent: 0 <= n_dup <= n_spans, permille exact.
    assert(r.filter($"n_dup_spans" < 0 || $"n_dup_spans" > $"n_spans")
      .count() == 0)
    assert(r.filter(
      $"dup_permille" =!= expr("n_dup_spans * 1000 div n_spans"))
      .count() == 0)
    r.unpersist()
    // Constructed corpus: two byte-identical docs share every span
    // (dup_permille == 1000), a token-disjoint third shares none (0),
    // and a 7-token doc emits no spans at all.
    val dir = scratch("dupspans")
    val twin = (1 to 12).map(i => s"tok$i").mkString(" ")
    val other = (1 to 12).map(i => s"zzz$i").mkString(" ")
    Seq((1L, twin, "en", "a", 1L), (2L, twin, "en", "a", 1L),
        (3L, other, "en", "a", 1L),
        (4L, "a b c d e f g", "en", "a", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val syn = SparkEntry.queries("text_dupspans")(spark, dir)
      .collect().map(x =>
        x.getAs[Long]("doc_id") -> x.getAs[Long]("dup_permille")).toMap
    assert(syn == Map(1L -> 1000L, 2L -> 1000L, 3L -> 0L),
      s"synthetic corpus law violated: $syn")
  }

  test("sample_split: stable, exhaustive, disjoint 80/10/10") {
    val r = q("sample_split").collect()
    assert(r.map(_.getAs[String]("split")).sorted.toSeq ==
      Seq("test", "train", "valid"))
    val total = Tables.load(spark, sf, "documents").count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == total,
      "splits must partition the corpus exactly")
    // Determinism: a re-run assigns identically (hash, not rand()).
    assertSameRows(q("sample_split"), q("sample_split"),
      "sample_split re-run")
    // Proportions: binomial bound, |p80 - 0.8| within 5 sigma.
    val train = r.find(_.getAs[String]("split") == "train").get
      .getAs[Long]("n_docs").toDouble
    val sigma = math.sqrt(total * 0.8 * 0.2)
    assert(math.abs(train - 0.8 * total) < 5 * sigma + 1,
      s"train fraction ${train / total} implausible for hash-uniform")
  }

  test("vec_mips: agrees with an independent brute-force ranking") {
    val e = Tables.load(spark, sf, "embeddings")
    val q0 = e.select($"vec_id".as("q_id"), $"embedding".as("qe"))
      .filter($"q_id" < 10)
    val c = e.select($"vec_id".as("c_id"), $"embedding".as("ce"))
    // Independent path: HOF zip_with/aggregate instead of fdot.
    val brute = broadcast(q0).crossJoin(c).filter($"q_id" =!= $"c_id")
      .withColumn("dot", aggregate(
        zip_with($"qe", $"ce", (a, b) =>
          a.cast("double") * b.cast("double")),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"dot".desc, $"c_id"))
        .cast("long"))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"c_id", $"dot")
    assertSameRows(q("vec_mips"), brute, "vec_mips vs HOF brute force")
  }

  test("dim_scd2: interval algebra and version contiguity") {
    val r = q("dim_scd2").cache()
    // Exactly one open (current) interval per user.
    val cur = r.groupBy($"user_id")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("k"))
    assert(cur.filter($"k" =!= 1).count() == 0,
      "each user needs exactly one current row")
    // valid_to chains to the NEXT version's valid_from; versions 1..n.
    val w = Window.partitionBy($"user_id").orderBy($"version")
    val chained = r
      .withColumn("next_from", lead($"valid_from", 1).over(w))
      .withColumn("rn", row_number().over(w))
    assert(chained.filter($"valid_to".isNotNull &&
      $"valid_to" =!= $"next_from").count() == 0,
      "valid_to must equal the successor's valid_from")
    assert(chained.filter($"rn" =!= $"version").count() == 0,
      "versions must be contiguous from 1")
    // Consecutive versions always change tier (SCD2 collapses runs).
    assert(r.withColumn("pt", lag($"tier", 1).over(w))
      .filter($"pt".isNotNull && $"pt" === $"tier").count() == 0,
      "adjacent versions must differ in the tracked attribute")
    r.unpersist()
  }

  test("win_ntile: equi-depth tiles within one row of each other") {
    val r = q("win_ntile").cache()
    val spread = r.groupBy($"c_mktsegment")
      .agg((max($"n") - min($"n")).as("spread"),
        sum($"n").as("total"), count(lit(1)).as("tiles"))
    assert(spread.filter($"spread" > 1).count() == 0,
      "ntile bucket sizes may differ by at most 1")
    assert(spread.filter($"tiles" =!= 4).count() == 0)
    val total = Tables.load(spark, sf, "customer").count()
    assert(r.agg(sum($"n")).head().getLong(0) == total)
    r.unpersist()
  }

  test("sql_recursive: depth-d population is exactly #{keys >= 2^d}") {
    // A key k contributes ancestor rows at depths 0..floor(log2 k),
    // so the depth-d row count must equal the number of customers
    // with c_custkey >= 2^d — an independent closed form.
    val keys = Tables.load(spark, sf, "customer")
      .select($"c_custkey").as[Long].collect()
    val got = q("sql_recursive").collect()
      .map(r => r.getAs[Int]("depth") -> r.getAs[Long]("n")).toMap
    (0 to got.keys.max).foreach { d =>
      // k >= 2^d for k >= 1; key 0 emits only its own depth-0 row.
      val want = keys.count(_ >= (1L << d)).toLong +
        (if (d == 0) keys.count(_ == 0L).toLong else 0L)
      assert(got.getOrElse(d, 0L) == want,
        s"depth $d: got ${got.getOrElse(d, 0L)}, want $want")
    }
  }

  test("dedup_containment: bounds, self-exclusion, full-containment law") {
    val r = q("dedup_containment").cache()
    assert(r.filter($"cont_m" < 0 || $"cont_m" > 1000000).count() == 0)
    assert(r.filter($"doc_id" === $"ref_id").count() == 0,
      "reference must not be compared to itself")
    assert(r.filter($"i" > $"nd").count() == 0,
      "intersection cannot exceed the doc's own shingle count")
    r.unpersist()
    // Constructed group: the short doc is a verbatim substring of the
    // long reference → containment exactly 1e6; the disjoint doc → 0.
    val dir = scratch("containment")
    val refText = "the quick brown fox jumps over the lazy dog again"
    Seq((1L, refText, "en", "g", refText.length.toLong),
        (2L, "quick brown fox", "en", "g", 15L),
        (3L, "zzz yyy xxx www", "en", "g", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val syn = SparkEntry.queries("dedup_containment")(spark, dir)
      .collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("cont_m"))
      .toMap
    assert(syn == Map(2L -> 1000000L, 3L -> 0L),
      s"containment law violated: $syn")
  }

  test("privacy_kanon: histogram accounts for every row, flag correct") {
    val r = q("privacy_kanon").collect()
    val total = Tables.load(spark, sf, "customer").count()
    assert(r.map(_.getAs[Long]("n_rows")).sum == total,
      "k-histogram must account for every customer row")
    r.foreach { row =>
      assert(row.getAs[Long]("n_rows") ==
        row.getAs[Long]("k") * row.getAs[Long]("n_groups"))
      assert(row.getAs[Boolean]("risky") == (row.getAs[Long]("k") < 5))
    }
  }

  test("win_streak: day accounting and a constructed streak") {
    val r = q("win_streak").cache()
    assert(r.filter($"max_streak" > $"n_days" ||
      $"n_streaks" > $"n_days" || $"max_streak" < 1).count() == 0)
    // n_days must equal the independent distinct-day count per user.
    val want = Tables.load(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .selectExpr("user_id", "date_trunc('DAY', ts) AS d").distinct()
      .groupBy($"user_id").agg(count(lit(1)).as("n_days"))
    assert(r.select($"user_id", $"n_days").join(want,
      Seq("user_id", "n_days")).count() == r.count(),
      "n_days mismatch vs independent recompute")
    r.unpersist()
    // Constructed series: days {1,2,3, 7,8} → 2 streaks, longest 3.
    val dir = scratch("streak")
    // ts is stored as raw nanos (Tables.load reads events via the
    // nanosAsLong conf and rescales itself).
    val rows = Seq(1L, 2L, 3L, 7L, 8L).zipWithIndex.map { case (d, i) =>
      (i.toLong, (d * 86400L + 60L) * 1000000000L,
        42L, "purchase", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props").write.parquet(s"$dir/events.parquet")
    val syn = SparkEntry.queries("win_streak")(spark, dir).collect()
    assert(syn.length == 1 &&
      syn(0).getAs[Long]("n_streaks") == 2 &&
      syn(0).getAs[Long]("max_streak") == 3 &&
      syn(0).getAs[Long]("n_days") == 5,
      s"constructed streak law violated: ${syn.mkString}")
  }

  test("ts_downsample: one representative per bucket, maximal deviation") {
    val r = q("ts_downsample").cache()
    // Independent recompute of the winner per (user, bucket) via a
    // groupBy + join (no window): same criterion, same tiebreak.
    val e = Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
        "unix_timestamp(date_trunc('SECOND', ts)) div 21600 AS bucket")
    val stats = e.groupBy($"user_id", $"bucket")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sumc"))
    val scored = e.join(stats, Seq("user_id", "bucket"))
      .withColumn("crit", abs($"cents" * $"n" - $"sumc"))
    val best = scored.groupBy($"user_id", $"bucket")
      .agg(max(struct($"crit", -$"event_id")).as("m"))
      .select($"user_id", $"bucket", (-$"m.col2").as("event_id"))
    assert(r.select($"user_id", $"bucket", $"event_id")
      .join(best, Seq("user_id", "bucket", "event_id")).count()
      == r.count(), "representative disagrees with max-struct recompute")
    assert(r.count() == stats.count(), "one row per populated bucket")
    r.unpersist()
  }

  test("join_interval_overlap: bucketed plan == direct interval join") {
    // The bucketed explode/residual/report-once machinery must equal
    // a direct (quadratic within user) interval join — same intervals,
    // no buckets. Proves no pair is lost or double-counted.
    def side(tpe: String, idc: String) =
      Tables.load(spark, sf, "events")
        .filter($"event_type" === tpe)
        .selectExpr(s"event_id AS $idc", "user_id",
          "unix_timestamp(date_trunc('SECOND', ts)) AS s",
          "unix_timestamp(date_trunc('SECOND', ts)) + " +
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " div 10 AS e")
        .filter($"e" > $"s")
    val p = side("purchase", "p_id")
    val c = side("click", "c_id")
      .withColumnRenamed("s", "cs").withColumnRenamed("e", "ce")
    val direct = p.join(c, Seq("user_id"))
      .filter($"s" < $"ce" && $"cs" < $"e")
      .select($"p_id", $"c_id", $"user_id",
        (least($"e", $"ce") - greatest($"s", $"cs")).as("overlap_s"))
    val got = q("join_interval_overlap")
    assertSameRows(got, direct, "bucketed vs direct interval join")
    assert(got.filter($"overlap_s" < 1).count() == 0,
      "strict overlap must be >= 1 second")
    assert(got.count() > 0, "fixture must produce overlapping pairs")
  }

  test("join_asof_nearest: bucketed candidates find the true nearest") {
    val got = q("join_asof_nearest").cache()
    assert(got.filter(abs($"dt_s") > 1800).count() == 0,
      "tolerance violated")
    // Direct (unbucketed) recompute of the nearest click per purchase.
    val e = Tables.load(spark, sf, "events")
      .selectExpr("event_id", "user_id", "event_type",
        "unix_timestamp(date_trunc('SECOND', ts)) AS sec")
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id", $"sec".as("p_sec"))
    val c = e.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id", $"sec".as("c_sec"))
    val direct = p.join(c, Seq("user_id"))
      .filter(abs($"c_sec" - $"p_sec") <= 1800)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"p_id")
          .orderBy(abs($"c_sec" - $"p_sec"), $"c_sec", $"c_id")))
      .filter($"rn" === 1)
      .select($"p_id", $"c_id", ($"c_sec" - $"p_sec").as("dt_s"))
    assertSameRows(got, direct, "bucketed vs direct nearest")
    got.unpersist()
  }

  test("dim_snapshot: exactly the SCD2 rows whose interval covers T") {
    val tUs = 1705276800000000L
    val hist = q("dim_scd2")
    val want = hist.filter($"valid_from" <= tUs &&
        ($"valid_to".isNull || $"valid_to" > tUs))
      .select($"user_id", $"version", $"tier", $"valid_from")
    assertSameRows(q("dim_snapshot"), want, "snapshot vs history filter")
    // At most one row per user (intervals are disjoint by the scd2
    // chaining law), and every user with history before T appears.
    val snap = q("dim_snapshot")
    assert(snap.groupBy($"user_id").count().filter($"count" > 1)
      .count() == 0, "a user has two rows valid at the same instant")
    val usersBefore = hist.filter($"valid_from" <= tUs)
      .select($"user_id").distinct().count()
    assert(snap.count() == usersBefore,
      "every user whose history starts before T must have a snapshot row")
  }

  test("ts_cusum: window form equals Page's reset recursion") {
    val rows = q("ts_cusum").collect()
    assert(rows.forall(_.getAs[Long]("stat") >= 0),
      "stat = cum - running min can never be negative")
    // Per user, replay the classic recursion s = max(0, s + x - k)
    // sequentially; it must equal the windowed statistic row by row
    // (the rows come back in (user, tsec, event_id) order).
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      var sRec = 0L
      rs.foreach { r =>
        sRec = math.max(0L, sRec + r.getAs[Long]("cents") - 5000L)
        assert(sRec == r.getAs[Long]("stat"),
          s"user $u event ${r.getAs[Long]("event_id")}: " +
            s"recursion $sRec != window ${r.getAs[Long]("stat")}")
      }
    }
  }

  test("graph_degree_dist: accounts for every directed edge and node") {
    val dist = q("graph_degree_dist").collect()
    val dirEdges = dist.map(r =>
      r.getAs[Long]("deg") * r.getAs[Long]("n_nodes")).sum
    val nodes = dist.map(_.getAs[Long]("n_nodes")).sum
    val undirected = Tables.load(spark, sf, "lineitem")
      .select($"l_partkey", $"l_suppkey").distinct().count()
    assert(dirEdges == 2 * undirected,
      s"directed edge mass $dirEdges != 2x$undirected")
    assert(nodes == q("graph_pagerank").count(),
      "degree distribution and pagerank must cover the same node set")
  }

  test("ts_ohlc: candle invariants and first/last agreement") {
    val r = q("ts_ohlc").cache()
    assert(r.filter($"low_c" > $"high_c" ||
      $"open_c" < $"low_c" || $"open_c" > $"high_c" ||
      $"close_c" < $"low_c" || $"close_c" > $"high_c").count() == 0,
      "open/close must lie inside [low, high]")
    // open/close must equal the window-computed first/last value.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type", $"day").orderBy($"seq")
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val e = Tables.load(spark, sf, "events")
      .selectExpr("event_type",
        "unix_timestamp(date_trunc('DAY', ts)) div 86400 AS day",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
        "unix_timestamp(date_trunc('SECOND', ts)) * 10000000" +
          " + event_id AS seq")
    val want = e
      .withColumn("open_c", first($"cents").over(w))
      .withColumn("close_c", last($"cents").over(w))
      .groupBy($"event_type", $"day", $"open_c", $"close_c")
      .agg(max($"cents").as("high_c"), min($"cents").as("low_c"),
        count(lit(1)).as("n"))
      .select($"event_type", $"day", $"open_c", $"high_c",
        $"low_c", $"close_c", $"n")
    assertSameRows(r, want, "min_by/max_by vs window first/last")
    r.unpersist()
  }

  test("agg_gini: impurity bounds") {
    q("agg_gini").collect().foreach { row =>
      val g = row.getAs[Double]("gini")
      val labels = row.getAs[Long]("n_labels").toDouble
      assert(g >= -1e-12 && g <= 1.0 - 1.0 / labels + 1e-12,
        s"gini $g outside [0, 1 - 1/$labels]")
    }
  }

  test("mm_ahash: 60-bit range; identical payloads collide") {
    val r = q("mm_ahash").cache()
    assert(r.filter($"ahash" < 0 || $"ahash" >= (1L << 60)).count() == 0,
      "ahash must fit in 60 bits")
    r.unpersist()
    val dir = scratch("ahash")
    val t = ("x" * 30) + ("~" * 30) // low half then high half: mixed bits
    Seq((1L, t, "en", "a", 60L), (2L, t, "en", "a", 60L),
        (3L, ("q" * 61), "en", "a", 61L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val syn = SparkEntry.queries("mm_ahash")(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("ahash"), x.getAs[Long]("n_mates"))).toMap
    assert(syn(1L) == syn(2L) && syn(1L)._2 == 2,
      "identical payloads must share an ahash with n_mates 2")
    assert(syn(3L)._1 == 0L && syn(3L)._2 == 1,
      "constant payload has no byte above the mean -> hash 0")
  }

  test("agg_skewkurt: agrees with Spark's native skewness/kurtosis") {
    // Spark's native skewness()/kurtosis() are population moments too
    // (not oracle-able cross-engine because their accumulation order
    // varies, but fine as an in-engine reference within tolerance).
    val native = Tables.load(spark, sf, "lineitem")
      .groupBy($"l_returnflag")
      .agg(skewness($"l_quantity").as("sk"),
        kurtosis($"l_quantity").as("ku"))
      .collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Double]("sk"), r.getAs[Double]("ku"))).toMap
    q("agg_skewkurt").collect().foreach { row =>
      val f = row.getAs[String]("l_returnflag")
      assert(math.abs(row.getAs[Double]("skew") - native(f)._1) < 1e-6,
        s"$f skew ${row.getAs[Double]("skew")} vs native ${native(f)._1}")
      assert(math.abs(row.getAs[Double]("kurt_excess") - native(f)._2)
        < 1e-6,
        s"$f kurt ${row.getAs[Double]("kurt_excess")} vs ${native(f)._2}")
    }
  }

  test("ts_seasonality: seven days per type, exactly one peak") {
    val r = q("ts_seasonality").cache()
    val byType = r.groupBy($"event_type")
      .agg(count(lit(1)).as("n_dows"),
        sum(when($"is_peak", 1).otherwise(0)).as("n_peaks"),
        min($"dow").as("lo"), max($"dow").as("hi"))
    assert(byType.filter($"n_dows" =!= 7 || $"n_peaks" =!= 1 ||
      $"lo" =!= 0 || $"hi" =!= 6).count() == 0,
      "each type needs dows 0..6 with exactly one peak")
    // Row accounting: per-type n sums to the type's event count.
    val want = Tables.load(spark, sf, "events")
      .groupBy($"event_type").agg(count(lit(1)).as("total"))
    val got = r.groupBy($"event_type").agg(sum($"n").as("total"))
    assertSameRows(got, want, "ts_seasonality row accounting")
    r.unpersist()
  }

  test("agg_corrmatrix: valid correlations, consistent with agg_regression") {
    val rows = q("agg_corrmatrix").collect()
    rows.foreach { row =>
      Seq("corr_qty_price", "corr_qty_disc", "corr_price_disc")
        .foreach { c =>
          val v = row.getAs[Double](c)
          assert(!v.isNaN && math.abs(v) <= 1.0 + 1e-12,
            s"$c = $v outside [-1, 1]")
        }
    }
    // corr(qty, price)^2 must equal agg_regression's r2 per group
    // (same quantities, both rounded at 1e-12 — compare loosely).
    val r2 = q("agg_regression").collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("r2"))
      .toMap
    rows.foreach { row =>
      val f = row.getAs[String]("l_returnflag")
      val c = row.getAs[Double]("corr_qty_price")
      assert(math.abs(c * c - r2(f)) < 1e-9,
        s"$f: corr^2 ${c * c} != r2 ${r2(f)}")
    }
  }
}
