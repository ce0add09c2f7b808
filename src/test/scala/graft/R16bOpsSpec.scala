package graft

import org.apache.spark.sql.functions._

/** r16 second-wave laws for the two new keys.
  *
  *  - `vec_lsh`: (1) plane-family independence — the md5-parity signs
  *    exist because a multiplicative-LCG parity is LINEAR in the
  *    flattened plane index and produced two bit-identical planes
  *    (measured |dot| = 64/64); this law pins the fix. (2) Full
  *    result equality against an independent driver-side mirror of
  *    the whole pipeline (buckets → candidate union → exact cosine
  *    top-5) — the DuckDB oracle already proves cross-engine
  *    agreement, this proves both engines compute the DESIGN, not a
  *    shared misreading (the r16 quantizer lesson: agreement is not
  *    sanity).
  *
  *  - `text_bpe_encode`: per-doc token accounting must equal a
  *    driver-side reference encode that applies the ORACLED
  *    `text_bpe_merges` table word-by-word (the R11dOpsSpec reference
  *    merger semantics) — tying encode to the learned merges
  *    end-to-end, not just to its own oracle mirror.
  */
class R16bOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def q(key: String) = SparkEntry.queries(key)(spark, sf)

  test("vec_lsh planes are pairwise independent (md5 mixing)") {
    import operators.LlmQueries.{lshBits, lshDims, lshPlane, lshTables}
    val planes = (for (t <- 0 until lshTables; j <- 0 until lshBits)
      yield lshPlane(t, j)).toVector
    val dots = for {
      i <- planes.indices; k <- planes.indices if i < k
    } yield planes(i).zip(planes(k)).map { case (a, b) => a * b }.sum.toInt
    assert(dots.forall(d => math.abs(d) < lshDims),
      s"degenerate plane pair: max |dot| = ${dots.map(math.abs).max} " +
        s"of $lshDims")
    // And balanced: no plane is near-constant.
    planes.foreach { p =>
      assert(math.abs(p.sum) < lshDims / 2,
        s"unbalanced plane: |sum| = ${p.sum}")
    }
  }

  test("vec_lsh equals an independent driver-side mirror end-to-end") {
    import operators.LlmQueries.{lshBits, lshDims, lshPlane, lshTables}
    val emb = Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def bucket(v: Array[Float], t: Int): Long =
      (0 until lshBits).map { j =>
        val pl = lshPlane(t, j)
        var acc = 0.0
        var d = 0
        while (d < lshDims) { acc += v(d).toDouble * pl(d); d += 1 }
        if (acc >= 0.0) 1L << j else 0L
      }.sum
    val buckets: Map[(Long, Int), Long] = (for {
      (id, v) <- emb.toSeq; t <- 0 until lshTables
    } yield (id, t) -> bucket(v, t)).toMap
    val cand = (for {
      qid <- emb.keys.toSeq if qid < 10
      cid <- emb.keys.toSeq if cid != qid
      if (0 until lshTables)
        .exists(t => buckets((qid, t)) == buckets((cid, t)))
    } yield (qid, cid)).toSet
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var sa = 0.0; var sb = 0.0
      var d = 0
      while (d < lshDims) {
        dot += a(d).toDouble * b(d).toDouble
        sa += a(d).toDouble * a(d).toDouble
        sb += b(d).toDouble * b(d).toDouble
        d += 1
      }
      dot / math.sqrt(sa * sb)
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nCand = cand.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val want = cand.groupBy(_._1).toSeq.flatMap { case (qid, pairs) =>
      pairs.toSeq
        .map { case (_, cid) => (cid, cos(emb(qid), emb(cid))) }
        .sortBy { case (cid, c) => (-c, cid) }
        .take(5).zipWithIndex
        .map { case ((cid, c), i) =>
          (qid, (i + 1).toLong, cid, r6(c), nCand(qid)) }
    }.sortBy(r => (r._1, r._2))
    val got = q("vec_lsh").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got == want,
      s"vec_lsh differs from the mirror:\n got  ${got.take(6)}\n" +
        s" want ${want.take(6)}")
    assert(got.nonEmpty, "vacuous: no LSH candidates at sf0.001")
  }

  test("text_bpe_encode equals reference encode over the learned merges") {
    val merges = q("text_bpe_merges").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
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
    val want = Tables.load(spark, sf, "documents")
      .select($"doc_id", lower($"text")).collect()
      .map { r =>
        val words = r.getString(1).split(" ")
          .filter(w => w.nonEmpty && !w.contains("|"))
        val nTok = words.map { w =>
          var syms = w.toVector.map(_.toString)
          merges.foreach { case (a, b) => syms = mergeWord(syms, a, b) }
          syms.length.toLong
        }.sum
        (r.getLong(0), words.length.toLong,
          words.map(_.length.toLong).sum, nTok)
      }
      .filter(_._2 > 0L) // docs with no encodable words drop (inner join)
      .toSeq.sortBy(_._1)
    val got = q("text_bpe_encode").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want,
      s"encode differs from reference:\n got  ${got.take(5)}\n" +
        s" want ${want.take(5)}")
    // Non-vacuous: at least one word actually merged (tokens < chars).
    assert(got.exists(r => r._4 < r._3),
      "vacuous: no word's token count shrank below its char count")
  }

  test("vec_lsh_table equals vec_lsh and its probe scan READS only " +
       "the query buckets (runtime partition metric)") {
    import operators.LlmQueries.{lshBits, lshDims, lshPlane, lshTables}
    // Layout law at sf0.01 (sf0.001's 10-query bucket union could
    // cover most of the occupied buckets; sf0.01 keeps it a strict
    // subset) + the R16 runtime-metric discipline: plan-shape
    // dynamicpruning strings can pass on a no-op filter, only the
    // scan's partition count proves the IO deletion.
    val dir = "/root/testdata/sf0.01"
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("vec_lsh_table")(spark, dir)
      df.collect() // execute: DPP metrics are runtime-populated
      def subtree(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(subtree)) ++
          p.subqueries.flatMap(subtree)
      val scans = subtree(df.queryExecution.executedPlan).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("lsh_idx")) => s
      }
      assert(scans.nonEmpty, "no FileSourceScanExec over lsh_idx in " +
        df.queryExecution.executedPlan.toString)
      // More than one scan instance can appear (DPP/reuse clones);
      // the EXECUTED one carries the populated metric.
      val partsRead = scans
        .map(_.metrics.get("numPartitions").map(_.value).getOrElse(
          fail(s"no numPartitions metric; have " +
            s"${scans.head.metrics.keys}")))
        .max
      val tag = Util.dirTag(dir)
      val occupied = spark.table(s"lsh_idx_$tag")
        .select($"t", $"bkt").distinct()
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val total = occupied.size.toLong
      // Independent driver-side mirror of the probe. NOTE the
      // per-COLUMN pruning semantics (measured): Spark plans one
      // dynamic filter per partition column — t IN (probed t's) AND
      // bkt IN (probed bkt VALUES across all tables) — not tuple
      // membership, so the floor is the occupied cross-filter set,
      // which is larger than the exact (t, bkt) tuple union but far
      // below the full index.
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter($"vec_id" < 10)
        .select($"vec_id", $"embedding").collect()
        .map(r => r.getSeq[Float](1).toArray)
      def bucket(v: Array[Float], t: Int): Long =
        (0 until lshBits).map { j =>
          val pl = lshPlane(t, j)
          var acc = 0.0
          var d = 0
          while (d < lshDims) { acc += v(d).toDouble * pl(d); d += 1 }
          if (acc >= 0.0) 1L << j else 0L
        }.sum
      val probed = (for (v <- emb.toSeq; t <- 0 until lshTables)
        yield (t, bucket(v, t))).toSet
      val probedTs = probed.map(_._1)
      val probedBkts = probed.map(_._2)
      val crossFilter = occupied.count { case (t, b) =>
        probedTs.contains(t) && probedBkts.contains(b) }.toLong
      assert(crossFilter < total,
        s"law vacuous here: cross-filter set $crossFilter == total " +
          s"$total occupied buckets — move to a sparser fixture")
      assert(partsRead == crossFilter,
        s"scan read $partsRead partitions; per-column DPP admits " +
          s"$crossFilter of $total occupied buckets (tuple union " +
          s"${probed.size}) — DPP is not pruning at runtime")
      // And the layout twins agree.
      assertSameRows(df, SparkEntry.queries("vec_lsh")(spark, dir),
        "vec_lsh_table vs vec_lsh")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("pipeline_mm equals the audit recomputed from its standalone " +
       "stage keys") {
    // Composition law (r17: mixed-modality; r18: three modalities):
    // the end-to-end audit must be derivable from the ORACLED
    // standalone relations — images (doc_id mod 3 = 0) from
    // mm_headers + mm_dedup + mm_framesample exactly as in r16,
    // audio (mod 3 = 1) from the oracled mm_audio decode, video
    // (mod 3 = 2) from the oracled mm_gif frame walk — with the
    // exact md5(text) byte-dedup re-derived HERE for both (an
    // independent mirror — exact-dup-by-digest has no standalone key
    // because the digest IS the operator). Stage semantics compose;
    // nothing in the pipeline recomputes differently from its
    // standalone key.
    val isAudio = pmod($"doc_id", lit(3L)) === 1L
    val isVideo = pmod($"doc_id", lit(3L)) === 2L
    val hdr = q("mm_headers").filter(!isAudio && !isVideo)
      .select($"doc_id", $"format", $"width", $"height", $"n_bytes")
    val ded = q("mm_dedup").select($"doc_id", $"comp", $"keep")
    val fsCnt = q("mm_framesample")
      .groupBy($"doc_id").agg(count(lit(1)).as("sampled"))
    val img = hdr.join(ded, Seq("doc_id"), "left")
      .withColumn("comp", coalesce($"comp", $"doc_id"))
      .withColumn("keep", coalesce($"keep", lit(true)))
      .join(fsCnt, Seq("doc_id"), "left")
      .withColumn("sampled", coalesce($"sampled", lit(0L)))
      .select($"format", $"keep", $"comp",
        ($"width" * $"height").as("budget"), $"n_bytes", $"sampled")
    val wtk = org.apache.spark.sql.expressions.Window.partitionBy($"tk")
    val au = q("mm_audio").filter(isAudio)
      .select($"doc_id", $"format", $"channels", $"n_frames", $"n_bytes")
      .join(Tables.load(spark, sf, "documents").filter(isAudio)
        .select($"doc_id", md5($"text").as("tk")), Seq("doc_id"))
      .withColumn("comp", min($"doc_id").over(wtk))
      .withColumn("keep", $"doc_id" === $"comp")
      .select($"format", $"keep", $"comp",
        ($"channels" * $"n_frames").as("budget"), $"n_bytes",
        expr("(n_frames - 1) div 3 + 1").as("sampled"))
    val wvk = org.apache.spark.sql.expressions.Window.partitionBy($"vk")
    val vid = q("mm_gif").filter(isVideo)
      .select($"doc_id", $"format", $"sum_px", $"n_frames", $"n_bytes")
      .join(Tables.load(spark, sf, "documents").filter(isVideo)
        .select($"doc_id", md5($"text").as("vk")), Seq("doc_id"))
      .withColumn("comp", min($"doc_id").over(wvk))
      .withColumn("keep", $"doc_id" === $"comp")
      .select($"format", $"keep", $"comp", $"sum_px".as("budget"),
        $"n_bytes", expr("(n_frames - 1) div 4 + 1").as("sampled"))
    val want = img.unionByName(au).unionByName(vid)
      .groupBy($"format", $"keep")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"comp").as("n_comps"),
        sum($"budget").as("budget"),
        sum($"n_bytes").as("sum_bytes"),
        sum($"sampled").as("frames_sampled"))
      .orderBy($"format", $"keep")
    val got = q("pipeline_mm")
    assertSameRows(got, want, "pipeline_mm vs composed stages")
    // Non-vacuous: the dedup stage actually dropped something, and
    // the audio branch is genuinely present in the audit.
    assert(got.filter(!$"keep").count() > 0,
      "vacuous: no near-dup images were dropped at this fixture")
    assert(got.filter($"format" === "wav").count() > 0,
      "vacuous: no audio rows in the mixed-modality audit")
    assert(got.filter($"format" === "gif").count() > 0,
      "vacuous: no video rows in the three-modality audit")
  }

  test("privacy_tclose equals a driver-side exact-rational EMD " +
       "reference") {
    val rows = Tables.load(spark, sf, "customer")
      .selectExpr("c_mktsegment",
        "(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) " +
          "+ 100000000) div 100000000")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bands = rows.map(_._2).distinct.sorted
    val m = bands.length.toLong
    val nTot = rows.length.toLong
    val gBand = rows.groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
    val want = rows.groupBy(_._1).toSeq.map { case (cls, v) =>
      val nCls = v.length.toLong
      val cBand = v.groupBy(_._2).map { case (b, w) => b -> w.length.toLong }
      var cum = 0L
      var emdNum = 0L
      bands.foreach { b =>
        cum += cBand.getOrElse(b, 0L) * nTot - gBand(b) * nCls
        emdNum += math.abs(cum)
      }
      val den = (m - 1) * nCls * nTot
      val emd = emdNum.toDouble / den.toDouble
      (cls, nCls, m, emdNum, den,
        BigDecimal(emd).setScale(12, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
        emd > 0.2)
    }.sortBy(_._1)
    val got = q("privacy_tclose").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6)))
      .toSeq
    assert(got == want,
      s"tclose differs from reference:\n got  $got\n want $want")
    // Non-vacuous: some class has nonzero distance from the global
    // distribution (an all-zero fixture would prove nothing).
    assert(got.exists(_._4 > 0L), "vacuous: every class EMD is zero")
  }
}
