package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic-law property tests (SURVEY.md §5.4) over scalacheck
  * generators with fixed seeds (deterministic CI). Generators feed
  * tiny literal DataFrames through the same operator definitions the
  * oracled queries use.
  */
class PropertyLawsSpec extends SparkTestBase {

  import spark.implicits._

  /** Deterministic sample of `n` values from a Gen. */
  private def sample[T](g: Gen[T], n: Int, seed: Long = 42L): Seq[T] = {
    val p = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .map(s => g.apply(p, s))
      .flatten.take(n).toSeq
  }

  private val wordGen = Gen.oneOf("join", "hash", "scan", "row", "batch",
    "filter", "merge", "sort", "the", "a", "data")
  private val docGen: Gen[String] =
    Gen.chooseNum(3, 20).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))

  /** The deterministic dedup form used by dedup_exact: keep lowest id
    * per text. */
  private def dedup(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rn", row_number().over(
        Window.partitionBy($"text").orderBy($"id")))
      .filter($"rn" === 1).drop("rn")
  }

  test("dedup is idempotent and keeps one row per distinct text") {
    val docs = sample(docGen, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val once = dedup(docs)
    assertSameRows(dedup(once), once, "idempotence")
    assert(once.count() == docs.select($"text").distinct().count())
  }

  test("minhashPairs candidates are COMPLETE for n_agree>=7 " +
      "(pigeonhole vs brute force)") {
    // One disagreeing minhash breaks exactly one r=2 band, so a pair
    // with >=7 of 8 agreeing shares >=3 intact bands and MUST meet in
    // the band equi-join — blocking loses nothing at that agreement
    // level. Verified against brute-force all-pairs over the same
    // signatures on the real sf0.001 corpus. The cap is lifted here:
    // this law is about BANDING losing nothing — the hot-bucket star
    // reroute is a deliberate, separately-lawed recall trade (next
    // test), and sf0.001 already contains a 395-doc hot bucket that
    // would otherwise engage it.
    val sigs = api.TextDedup.minhashSignatures(
      operators.TextBlocking.tokens(spark, sf))
    val agree = (1 to 8).map(i =>
      when(col(s"p$i") === col(s"q$i"), 1L).otherwise(0L)).reduce(_ + _)
    val x = sigs.select($"doc_id".as("da") +:
      (1 to 8).map(i => col(s"m$i").as(s"p$i")): _*)
    val y = sigs.select($"doc_id".as("db") +:
      (1 to 8).map(i => col(s"m$i").as(s"q$i")): _*)
    val brute = x.crossJoin(y).filter($"da" < $"db")
      .withColumn("n_agree", agree).filter($"n_agree" >= 7)
      .select($"da", $"db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = api.TextDedup.minhashPairs(sigs, bucketCap = Int.MaxValue)
      .select($"da", $"db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "law is vacuous: no >=7-agreement pairs")
    assert(brute.subsetOf(got),
      s"banding lost ${(brute -- got).take(5)} of ${brute.size} pairs")
  }

  test("minhashPairs hot-bucket cap: bounded candidates, star recall " +
      "inside the capped bucket, untouched recall outside") {
    // Constructed skew (r10 verdict item 1): 600 byte-identical docs —
    // every band bucket they form has 600 members, over the default
    // bucketCap of 256 — plus 20 disjoint exact-dup pairs in their own
    // size-2 buckets. The capped pipeline must (a) emit the hot
    // cluster as a 599-edge canonical star, NOT the 179,700-edge
    // clique, (b) leave the 20 small-bucket pairs exactly as the
    // uncapped pipeline would, and (c) reproduce the full clique when
    // the cap is lifted — proving the reroute is the only difference.
    val hot = (0 until 600).map(i =>
      (1000L + i, "alpha beta gamma delta epsilon"))
    val pairs = (0 until 20).flatMap(i => Seq(
      (2L * i, s"pairword$i uniqtok$i filler$i"),
      (2L * i + 1, s"pairword$i uniqtok$i filler$i")))
    val docs = (hot ++ pairs).toDF("id", "text")
    val sigs = api.TextDedup.minhashSignatures(
      api.TextDedup.tokens(docs, "id", "text"))
    val capped = api.TextDedup.minhashPairs(sigs)
      .select($"da", $"db").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = (1 to 599).map(i => (1000L, 1000L + i)).toSet
    val smallPairs = (0 until 20).map(i => (2L * i, 2L * i + 1)).toSet
    assert(capped == star ++ smallPairs,
      s"capped edge set wrong: ${capped.size} edges, " +
        s"missing ${((star ++ smallPairs) -- capped).take(3)}, " +
        s"extra ${(capped -- star -- smallPairs).take(3)}")
    val uncappedPairs =
      api.TextDedup.minhashPairs(sigs, bucketCap = Int.MaxValue)
    assert(uncappedPairs.count() == 600L * 599 / 2 + 20,
      s"uncapped clique count wrong: ${uncappedPairs.count()}")
    // CLUSTER-level recall is invariant under the cap: connected
    // components over the 599-edge star resolve to exactly the same
    // (doc, component) relation as over the 179,700-edge clique —
    // the star reroute loses edges, never cluster membership. This is
    // the law dedup_minhash_cluster (pairs -> components) rides on.
    assertSameRows(
      operators.DedupCluster.components(
        api.TextDedup.minhashPairs(sigs).select($"da", $"db")),
      operators.DedupCluster.components(
        uncappedPairs.select($"da", $"db")),
      "capped vs uncapped components")
  }

  test("dedupCorpus is idempotent and leaves a pair-free corpus") {
    // Signatures are per-doc, so removing docs never changes a
    // survivor's signature or band keys: pairs among survivors are a
    // subset of the original pairs, every original pair lies inside
    // one component, and at most one doc per component survives —
    // hence the surviving corpus has NO gated pairs at all and a
    // second pass is a no-op. (This is the library-level guarantee
    // behind `pipeline_neardup`'s summary being stable.)
    val docs = sample(docGen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val once = api.TextDedup.dedupCorpus(docs, "id", "text")
    assert(once.count() < docs.count(),
      "law is vacuous: generator produced no near-dups")
    val twice = api.TextDedup.dedupCorpus(once, "id", "text")
    assertSameRows(twice, once, "dedupCorpus idempotence")
    val residualPairs = api.TextDedup.minhashPairs(
      api.TextDedup.minhashSignatures(
        api.TextDedup.tokens(once, "id", "text"))).count()
    assert(residualPairs == 0,
      s"survivors still pair: $residualPairs gated pairs remain")
  }

  test("dedup_hamming64 multi-block candidates are COMPLETE for the " +
      "hdist<=3 ball (pigeonhole vs brute force)") {
    // The whole Manku argument: 3 differing bits cannot touch all 4
    // blocks, so blocking loses nothing at the <=3 threshold. Compare
    // the shipped blocked operator against brute-force all-pairs over
    // the same signatures on the real sf0.001 corpus.
    val sig = operators.TrainQueries.simhash64Sigs(spark, sf)
    val x = sig.select($"doc_id".as("da"), $"b0".as("a0"),
      $"b1".as("a1"), $"b2".as("a2"), $"b3".as("a3"))
    val y = sig.select($"doc_id".as("db"), $"b0".as("c0"),
      $"b1".as("c1"), $"b2".as("c2"), $"b3".as("c3"))
    val brute = x.crossJoin(y).filter($"da" < $"db")
      .withColumn("hdist", expr(
        "CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1) " +
          "+ bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"))
      .filter($"hdist" <= 3)
      .select($"da", $"db", $"hdist")
    val blocked = SparkEntry.queries("dedup_hamming64")(spark, sf)
    assertSameRows(blocked, brute, "pigeonhole completeness")
    assert(blocked.count() > 0, "fixture should contain near-dup pairs")
  }

  test("sketch_cms never underestimates (CMS one-sided error law)") {
    // est = min over d counters that each include every occurrence of
    // the term, so est >= true count always — the law that makes CMS
    // usable as a pre-filter at 100 TB (false positives only).
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("sketch_cms")(spark, sf)
      .select(col("true_cnt"), col("est")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0),
        s"CMS underestimated: est=${r.getLong(1)} < true=${r.getLong(0)}")
    }
  }

  test("union-all counts are additive; intersect is a lower bound") {
    val a = sample(docGen, 60, 1L).toDF("text")
    val b = sample(docGen, 40, 2L).toDF("text")
    assert(a.unionAll(b).count() == a.count() + b.count())
    val i = a.intersect(b)
    assert(i.count() <= math.min(
      a.distinct().count(), b.distinct().count()))
    assert(i.exceptAll(a.distinct()).count() == 0)
  }

  test("global sort is permutation-invariant") {
    val rows = sample(Gen.zip(Gen.chooseNum(0L, 50L),
      Gen.chooseNum(-1000.0, 1000.0).map(v => math.round(v * 100) / 100.0)),
      200).zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
    val df = rows.toDF("k", "v", "id")
    val shuffled = df.repartition(7, $"v")
    val s1 = df.orderBy($"k", $"v", $"id").collect().toSeq
    val s2 = shuffled.orderBy($"k", $"v", $"id").collect().toSeq
    assert(s1 == s2)
  }

  test("cosine(v, v) == 1 exactly for the knn fold on nonzero vectors") {
    val vecGen = Gen.listOfN(16,
      Gen.chooseNum(-100, 100).map(_ / 64.0f)).suchThat(_.exists(_ != 0f))
    val vs = sample(vecGen, 30).map(v => Tuple1(v.toArray)).toDF("v")
    val ss = aggregate($"v", lit(0.0),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
    // Same formula as vec_knn: dot / sqrt(ss_a * ss_b).
    val cos = vs.select((aggregate(
        zip_with($"v", $"v",
          (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x) / sqrt(ss * ss))
      .as("c")).collect().map(_.getDouble(0))
    // dot(v,v) ≡ ss(v) bit-exactly (identical fold); the ±2-ulp slack
    // is the sqrt(ss²) normalization — the reason the oracled query
    // rounds cosines to 6 decimals before emitting them.
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-12), cos.mkString(","))
  }

  test("polynomial fingerprint: equal text ⇒ equal fp; injective on sample") {
    val texts = sample(docGen, 100).distinct
    val df = (texts ++ texts).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .withColumn("fp", aggregate(split($"text", ""), lit(0L),
        (h, c) => pmod(h * 131L + ascii(c), lit(1000000007L))))
    val perText = df.groupBy($"text")
      .agg(countDistinct($"fp").as("nfp")).collect()
    assert(perText.forall(_.getLong(1) == 1L), "same text, differing fp")
    val collisions = df.select($"text", $"fp").distinct()
      .groupBy($"fp").count().filter($"count" > 1).count()
    assert(collisions == 0, "fingerprint collision on tiny sample")
  }

  test("streaming cents() matches the batch decimal-cents expression") {
    val vals = sample(Gen.chooseNum(0, 1000000)
      .map(_ / 100.0), 300)
    val batch = vals.toDF("v")
      .select((Det.money($"v") * 100).cast(LongType).as("c"))
      .collect().map(_.getLong(0)).toSeq
    val typed = vals.map(graft.streaming.StreamQueries.cents)
    assert(batch == typed)
  }

  test("IVF kNN: cosines bounded by brute force, recall >= 0.3") {
    // Honest-IVF floor (reset r16): until r15 the coarse quantizer
    // was degenerate — unscaled 1e7-quantized centroids put EVERY
    // vector in one cell, so "IVF" scanned the whole corpus and
    // recall 0.92 measured the bug, not the index (caught by
    // R16OpsSpec's runtime partition metric). With the quantizer
    // fixed, a 3-of-10-cell probe on this LABEL-STRUCTURELESS fixture
    // (within-label cosine == across-label, ~0) admits ~30% of the
    // corpus and measures recall 0.48 (sf0.001) / 0.52 (sf0.01) —
    // the index's true pruning loss on geometry-free data, which a
    // real corpus with cluster structure would not pay. The floor
    // guards the PROBE design (3 cells reachable, exact rank within
    // them); the within-probe exactness is the next law's job.
    val brute = SparkEntry.queries("vec_knn")(spark, sf)
      .select($"q_id", $"c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("vec_knn_ivf")(spark, sf)
      .select($"q_id", $"c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size == brute.size)
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall $recall vs brute force")
  }

  test("IVF-PQ ADC + re-rank loses NOTHING beyond the coarse index " +
       "(recall >= 0.9 relative to vec_knn_ivf)") {
    // The decomposition law (r16): vec_ivfpq's loss has two possible
    // sources — the coarse index pruning (shared with vec_knn_ivf)
    // and the 8-byte PQ compression. The ADC shortlist@50 + exact
    // re-rank design exists to make the SECOND loss nil, so the law
    // compares against vec_knn_ivf (same probed cells, exact float
    // ranking): measured relative recall 1.0 at sf0.001 AND sf0.01 —
    // every neighbor the probed cells admit survives quantization.
    // Floor 0.9 guards the design (shortlist wide enough, re-rank
    // exact), not the fixture's noise. Absolute recall vs brute force
    // is the previous law's subject.
    val ivf = SparkEntry.queries("vec_knn_ivf")(spark, sf)
      .select($"q_id", $"c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = SparkEntry.queries("vec_ivfpq")(spark, sf)
      .select($"q_id", $"c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivfpq.size == ivf.size)
    val rel = ivfpq.intersect(ivf).size.toDouble / ivf.size
    assert(rel >= 0.9, s"IVF-PQ relative recall $rel vs vec_knn_ivf")
  }

  test("batch sessionization agrees with native session_window") {
    val ours = SparkEntry.queries("win_sessionize")(spark, sf)
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").as("n_events"))
    val native = graft.streaming.StreamQueries.sessions(
        Tables.load(spark, sf, "events"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"),
        sum($"n").as("n_events"))
    assertSameRows(ours, native, "lag/cumsum vs session_window")
  }

  test("normalizeText is idempotent and folds unicode noise") {
    import graft.functions.TextNormalize
    TextNormalize.register(spark)
    // Corpus text plus hand-picked unicode noise: NFD sequences,
    // zero-width chars, NBSP, controls, multi-space runs.
    val noisy = Tables.load(spark, sf, "documents")
      .select(concat(lit("Cafe\u0301 \u200B du\u00A0 monde\t"),
        $"text", lit(" \u0007 fin\u2060ale  ")).as("t"))
    val once = noisy.select(TextNormalize.normalizeText($"t").as("n1"))
    val twice = once.select($"n1",
      TextNormalize.normalizeText($"n1").as("n2"))
    assert(twice.filter($"n1" =!= $"n2").count() == 0,
      "normalize(normalize(x)) must equal normalize(x)")
    // The noise is actually folded: accents gone, invisibles gone,
    // whitespace collapsed, ends trimmed.
    val bad = once.filter($"n1".rlike("[\\x{200B}\\x{2060}\\u00A0\\u0301\\t\\u0007]")
        || $"n1".contains("  ") || $"n1".startsWith(" ") || $"n1".endsWith(" ")
        || !$"n1".startsWith("Cafe du monde"))
    assert(bad.count() == 0, "normalization must fold all injected noise")
  }

  test("decodeImageHeader parses real PNG/JPEG headers and rejects junk") {
    import graft.functions.Multimodal.decodeImageHeader
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def be32(v: Int) = Seq(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
    def be16(v: Int) = Seq((v >>> 8) & 0xff, v & 0xff)
    // PNG: signature + IHDR with w=800, h=600.
    val png = bytes(Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt)
      ++ be32(800) ++ be32(600) ++ Seq(8, 2, 0, 0, 0): _*)
    assert(decodeImageHeader(png) == Some(("png", 800, 600)))
    // JPEG with three variable-length segments before a PROGRESSIVE
    // frame (SOF2): APP0 (len 16), APP1 (len 8), COM (len 5) — the
    // walk must chain length fields, not assume one fixed APP0.
    val jpeg = bytes(Seq(0xff, 0xd8,
      0xff, 0xe0) ++ be16(16) ++ Seq.fill(14)(0x4a)
      ++ Seq(0xff, 0xe1) ++ be16(8) ++ Seq.fill(6)(0x45)
      ++ Seq(0xff, 0xfe) ++ be16(5) ++ Seq.fill(3)(0x21)
      ++ Seq(0xff, 0xc2) ++ be16(17) ++ Seq(8)
      ++ be16(123) ++ be16(456) ++ Seq(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1): _*)
    assert(decodeImageHeader(jpeg) == Some(("jpeg", 456, 123)))
    // SOS before any SOF frame: not decodable.
    val headless = bytes(0xff, 0xd8, 0xff, 0xda, 0, 4, 1, 2, 9, 9, 9)
    assert(decodeImageHeader(headless).isEmpty)
    // Plain text bytes: no image at all.
    assert(decodeImageHeader("hello world, not an image".getBytes).isEmpty)
    // LOSSLESS frame (SOF3) preceded by FF fill-byte padding (spec
    // B.1.1.2 allows any number of fill bytes before a marker): the
    // full SOFn range must decode, and fill bytes must not be parsed
    // as a marker with a garbage length (r6 advice).
    val lossless = bytes(Seq(0xff, 0xd8,
      0xff, 0xe0) ++ be16(6) ++ Seq.fill(4)(0x4a)
      ++ Seq(0xff, 0xff, 0xff) // fill padding
      ++ Seq(0xff, 0xc3) ++ be16(11) ++ Seq(8)
      ++ be16(77) ++ be16(99) ++ Seq(1, 1, 0x11, 0): _*)
    assert(decodeImageHeader(lossless) == Some(("jpeg", 99, 77)))
    // Arithmetic-coded progressive (SOF10 = 0xCA) also a frame; DHT
    // (0xC4) must still be walked as a generic segment, not a frame.
    val sof10 = bytes(Seq(0xff, 0xd8,
      0xff, 0xc4) ++ be16(5) ++ Seq.fill(3)(0)
      ++ Seq(0xff, 0xca) ++ be16(11) ++ Seq(8)
      ++ be16(10) ++ be16(20) ++ Seq(1, 1, 0x11, 0): _*)
    assert(decodeImageHeader(sof10) == Some(("jpeg", 20, 10)))
  }

  test("normalizeText re-composes to NFC (Hangul survives mark-strip)") {
    import graft.functions.TextNormalize
    TextNormalize.register(spark)
    // 한국 (Hangul syllables): NFD decomposes them to conjoining Jamo
    // (category Lo, NOT Mn) — after mark-stripping, the final NFC pass
    // must re-compose back to the 2 syllables so length/hash agree
    // with DuckDB's composed strip_accents output.
    val r = Seq("한국 café").toDF("t")
      .select(TextNormalize.normalizeText($"t").as("n"))
      .head().getString(0)
    assert(r == "한국 cafe", s"expected composed output, got '$r'")
    assert(r.codePointCount(0, r.length) == 7)
  }

  test("unicode_normalize rejects bad arity / non-literal / null form cleanly") {
    import graft.functions.TextNormalize
    TextNormalize.register(spark)
    val df = Seq("x").toDF("t")
    val e1 = intercept[Exception] { df.selectExpr("unicode_normalize(t)") }
    assert(e1.getMessage.contains("2 arguments"),
      s"arity error unclear: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      df.selectExpr("unicode_normalize(t, t)")
    }
    assert(e2.getMessage.contains("literal"),
      s"non-foldable error unclear: ${e2.getMessage}")
    val e3 = intercept[Exception] {
      df.selectExpr("unicode_normalize(t, CAST(NULL AS STRING))")
    }
    assert(e3.getMessage.contains("NULL"),
      s"null-form error unclear: ${e3.getMessage}")
  }

  test("multimodal feature extraction preserves rows and dedups by checksum") {
    import graft.functions.Multimodal
    val ds = Multimodal.fromDocuments(spark, sf)
    val feats = Multimodal.extractFeatures(ds).cache()
    try {
      assert(feats.count() == ds.count())
      // checksum-distinct == payload-distinct (FNV-1a faithful on sample)
      val nPayload = ds.select(md5($"payload")).distinct().count()
      val nChecksum = feats.select($"checksum").distinct().count()
      assert(nChecksum == nPayload)
      // stub decoder is deterministic + kind-consistent
      val bad = feats.filter(
        ($"kind" === "image" && ($"width" <= 0 || $"duration_ms" =!= 0)) ||
        ($"kind" === "audio" && ($"width" =!= 0 || $"duration_ms" <= 0)) ||
        ($"kind" === "video" && ($"width" <= 0 || $"duration_ms" <= 0)))
      assert(bad.count() == 0)
    } finally feats.unpersist()
  }

  test("Warehouse.scd2Merge == rebuild over random change streams " +
      "and random cutoffs (property law)") {
    // Random per-entity event streams (few entities, few attribute
    // values → dense change/no-change mixtures) merged at three
    // different cutoffs, including cutoffs that make the delta empty
    // and cutoffs before all data (hist empty — every user is a
    // brand-new insert). The merge must equal the full rebuild in
    // every case — the law that catches the boundary corners a single
    // fixture cutoff cannot.
    val evGen = for {
      key <- Gen.chooseNum(1, 6)
      tmin <- Gen.chooseNum(0, 99)
      attr <- Gen.oneOf("a", "b", "c")
    } yield (key.toLong, tmin, attr)
    val rows = sample(evGen, 120, seed = 7L).zipWithIndex.map {
      case ((k, tmin, a), i) =>
        (k, java.sql.Timestamp.valueOf(
          f"2024-03-01 ${tmin / 60}%02d:${tmin % 60}%02d:00"), i.toLong, a)
    }.toDF("k", "t", "tie", "attr")
    val rebuilt = api.Warehouse.scd2(rows, "k", "t", "tie", "attr")
    Seq("2024-02-01 00:00:00", "2024-03-01 00:50:00",
        "2024-12-31 00:00:00").foreach { cut =>
      val c = java.sql.Timestamp.valueOf(cut)
      val hist = api.Warehouse.scd2(rows.filter($"t" < c),
        "k", "t", "tie", "attr")
      val merged = api.Warehouse.scd2Merge(hist,
        rows.filter($"t" >= c), "k", "t", "tie", "attr")
      assertSameRows(merged, rebuilt, s"merge@$cut vs rebuild")
    }
  }

  test("Graph.bfsDistances equals a driver-side reference BFS on " +
      "random graphs (property law)") {
    val edgeGen = for {
      a <- Gen.chooseNum(0, 25); b <- Gen.chooseNum(0, 25)
    } yield (a.toLong, b.toLong)
    val edges = sample(edgeGen, 60, seed = 11L).distinct
    val seeds = Seq(0L, 7L, 13L)
    // Reference: plain frontier BFS over the directed adjacency.
    val adj = edges.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    var hops = 0L
    while (frontier.nonEmpty && hops < 8) {
      hops += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(dist.contains)
      next.foreach(n => dist += n -> hops)
      frontier = next
    }
    val got = api.Graph.bfsDistances(
        edges.toDF("src", "dst"), seeds.toDF("node"), rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == dist,
      s"BFS mismatch:\n got  ${got.toSeq.sorted}\n want ${dist.toSeq.sorted}")
  }

  test("Graph.jaccardTopK matches a brute-force Jaccard on random " +
      "bipartite memberships (property law)") {
    val mGen = for {
      node <- Gen.chooseNum(1, 8); item <- Gen.chooseNum(1, 15)
    } yield (node.toLong, s"i$item")
    val mem = sample(mGen, 70, seed = 23L).distinct
    val cap = 5
    // Brute force on the capped item set.
    val itemCount = mem.groupBy(_._2).map { case (i, xs) => i -> xs.size }
    val capped = mem.filter { case (_, i) => itemCount(i) <= cap }
    val sets = capped.groupBy(_._1).map { case (n, xs) =>
      n -> xs.map(_._2).toSet }
    val want = (for {
      (n1, s1) <- sets.toSeq; (n2, s2) <- sets.toSeq
      if n1 != n2
      common = (s1 & s2).size if common > 0
    } yield (n1, n2, common.toLong,
        common.toLong * 1000000L / (s1.size + s2.size - common)))
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._4, r._2)).take(5)
      }.toSet
    val got = api.Graph.jaccardTopK(mem.toDF("n", "i"), "n", "i",
        hubCap = cap, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want,
      s"jaccard mismatch:\n got  ${got.toSeq.sorted}\n" +
        s" want ${want.toSeq.sorted}")
  }
}
