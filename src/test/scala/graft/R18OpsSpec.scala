package graft

import org.apache.spark.sql.functions._

/** r18 laws (r17 verdict items 4 and 6):
  *
  *  - mm_gif's payloads pinned BYTE-EXACT against an independent
  *    java.io little-endian GIF89a writer (the mm_audio/R17OpsSpec
  *    discipline): the DuckDB oracle proves decode(synthesize(p)) ==
  *    p, which a CONSISTENT layout bug survives (both sides agreeing
  *    on a wrong offset still self-agree); only byte equality against
  *    an independently-built GIF proves the payload is the public
  *    GIF89a layout a real indexer would walk.
  *
  *  - the frame WALK is additionally probed on adversarial bytes the
  *    fixture never produces (truncated table, missing trailer, bad
  *    magic): a walk that ignores validation would report format =
  *    'gif' on garbage; these pin the 'unknown' path.
  */
class R18OpsSpec extends SparkTestBase {
  import spark.implicits._

  /** Rows the parquet scan MATERIALIZED (post row-group/page skip,
    * pre Filter) + result count — R17OpsSpec's probe, repeated here
    * for the 100x variant of the law. */
  private def probeScanRows(path: String, keys: Seq[Long],
      opts: Map[String, String]): (Long, Long) = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val rd = opts.foldLeft(spark.read) { case (r, (k, v)) => r.option(k, v) }
    val df = rd.parquet(path).filter($"o_orderkey".isin(keys: _*))
    val matched = df.count()
    df.collect()
    def subtree(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: p.children.flatMap(subtree)
    val scans = subtree(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
    (scans.head.metrics("numOutputRows").value, matched)
  }

  test("scan_bloom_idx: the bloom still EXISTS and skips at the 100x " +
       "staging (the NDV sizing survives its design decade)") {
    // r17 verdict item 6: stageBloomIdx sizes the bloom NDV for the
    // 100x decade (~1.9M distinct keys per row group), but no law
    // asserted the bloom SURVIVES there — an undersized NDV saturates
    // SILENTLY (correctness unaffected, skip gone), and parquet-mr
    // omits the bloom entirely under conditions that only manifest at
    // scale (dictionary fallback thresholds, the max-bytes cap). This
    // is the sf0.01 R17OpsSpec law re-proven ON the decade the sizing
    // targets, with the same disabled-reader control attribution.
    // Gated on the staging (R15OpsSpec pattern): cancels, not fails,
    // when /tmp/graft_sf10 is absent.
    val staged = "/tmp/graft_sf10"
    assume(new java.io.File(s"$staged/orders.parquet").exists(),
      "100x staging absent (run ScaleBench with SPARK_GRAFT_SCALE_MULT=100)")
    val (scatter, _, keys) =
      operators.SourceSinkQueries.stageBloomIdx(spark, staged)
    val files = new java.io.File(scatter).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    assert(files.size == 8, s"expected 8 staged files, got ${files.size}")
    val perFile = files.map { f =>
      val d = spark.read.parquet(f)
      (d.count(), d.filter($"o_orderkey".isin(keys: _*)).count() > 0)
    }
    val total = perFile.map(_._1).sum
    val expected = perFile.filter(_._2).map(_._1).sum
    val maxFile = perFile.map(_._1).max
    assert(expected < total,
      "mirror degenerate: every file contains a probed key")
    val (bloomRows, matched) = probeScanRows(scatter, keys, Map.empty)
    val (controlRows, matchedC) = probeScanRows(scatter, keys,
      Map("parquet.filter.bloom.enabled" -> "false"))
    assert(matched == matchedC && matched >= 2,
      s"probe results differ or degenerate: $matched vs $matchedC")
    assert(bloomRows >= expected && bloomRows <= expected + 2 * maxFile,
      s"bloom scan read $bloomRows rows at 100x; mirror expects " +
        s"$expected (+<=${2 * maxFile} FP slack) of $total — " +
        "the bloom is absent or saturated at its design decade")
    assert(controlRows == total,
      s"control (bloom read disabled) read $controlRows of $total — " +
        "something else is pruning; the attribution law is broken")
    // The committed 100x skip-metric row (r17 verdict item 6's
    // deliverable): rows materialized with/without the bloom at the
    // decade the NDV was sized for.
    val json = s"""{"metric":"bloom100x","staging":"$staged",""" +
      s""""total_rows":$total,"bloom_rows":$bloomRows,""" +
      s""""control_rows":$controlRows,"mirror_expected":$expected,""" +
      s""""skip_ratio":${"%.3f".formatLocal(java.util.Locale.ROOT,
        controlRows.toDouble / math.max(1L, bloomRows))}}"""
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target/bloom100x.json"), json)
  }

  test("mm_gif payloads byte-equal an independent little-endian " +
       "GIF89a writer") {
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = operators.TrainQueries.mmGifPayloads(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.keySet == docs.keySet,
      s"payload doc set differs: ${got.size} vs ${docs.size}")
    docs.foreach { case (id, text) =>
      val out = new java.io.ByteArrayOutputStream()
      def u8(v: Long): Unit = out.write((v & 0xff).toInt)
      def le16(v: Long): Unit = { u8(v); u8(v >> 8) }
      out.write("GIF89a".getBytes("US-ASCII"))
      le16(id % 320 + 16); le16(id * 11 % 240 + 16) // screen w, h
      u8(0); u8(0); u8(0)                           // no GCT, bg, aspect
      val nf = (1 + id % 7).toInt
      (0 until nf).foreach { k =>
        u8(0x21); u8(0xF9); u8(0x04); u8(0x00)      // GCE
        le16((id + k * 37) % 500 + 2); u8(0); u8(0) // delay, transp, term
        u8(0x2C)                                    // image descriptor
        le16((id + k) % 8); le16((id * 3 + k) % 8)  // left, top
        le16((id + k * 5) % 32 + 1); le16((id * 7 + k * 3) % 24 + 1)
        u8(0)                                       // no local table
        u8(0x07)                                    // LZW min code size
        val nsb = (1 + (id + k) % 3).toInt
        (0 until nsb).foreach { j =>
          val sz = (1 + (id + k * 7 + j * 13) % 32).toInt
          u8(sz)
          (0 until sz).foreach { i =>
            u8(text.charAt(((k * 31 + j * 17 + i) % text.length).toInt)
              .toLong)
          }
        }
        u8(0)                                       // chain terminator
      }
      u8(0x3B)                                      // trailer
      val want = out.toByteArray
      assert(java.util.Arrays.equals(got(id), want),
        s"doc $id: payload differs from the independent GIF89a writer " +
          s"(got ${got(id).take(48).map(b => f"${b & 0xff}%02x").mkString} " +
          s"want ${want.take(48).map(b => f"${b & 0xff}%02x").mkString})")
    }
    // Non-vacuity: every frame count 1..7 and sub-block count 1..3
    // occurs, so the walk is exercised across its whole range.
    assert(docs.keys.map(_ % 7).toSet.size == 7 &&
      docs.keys.map(_ % 3).toSet.size == 3)
  }

  test("mm_gif frame walk rejects adversarial byte streams the " +
       "fixture never produces") {
    // The decode side of mm_gif never sees a malformed payload from
    // the synthetic corpus, so the format='unknown' branch would be
    // dead code without this: feed the SAME walk (via a payload view
    // substituted under the relation's expectations) corrupted
    // variants and pin that validation catches each. Built by
    // running mmGifRel's walk over a one-table parquet staging whose
    // payloads are hand-corrupted copies of real ones.
    val real = operators.TrainQueries.mmGifPayloads(spark, sf)
      .orderBy($"doc_id").limit(4)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    def corrupt(tag: Long, bytes: Array[Byte]): Array[Byte] = tag match {
      case 0 => bytes.updated(0, 'X'.toByte)              // bad magic
      case 1 => bytes.dropRight(1)                        // no trailer
      case 2 => bytes.updated(13, 0x2C.toByte)            // ID before GCE
      case 3 => // truncate mid-chain: chop after the first frame's GCE
        bytes.take(21)
      case _ => bytes
    }
    val dir = scratch("mm_gif_adversarial")
    // doc_id encodes which corruption was applied; text is unused by
    // the decode (payload-only discipline) but the staging keeps the
    // documents schema so mmGifRel's Tables.load contract would not
    // apply here — we run the WALK stage directly over the payloads.
    val df = real.zipWithIndex.map { case ((_, b), i) =>
      (i.toLong, corrupt(i.toLong, b))
    }.toSeq.toDF("doc_id", "payload")
    df.write.mode("overwrite").parquet(dir)
    val walked = operators.TrainQueries.mmGifWalk(
      spark.read.parquet(dir))
    val formats = walked.select($"doc_id", $"format").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(formats.values.forall(_ == "unknown"),
      s"adversarial payloads not rejected: $formats")
    // And the UNCORRUPTED payloads pass through the same direct-walk
    // path as 'gif' (the law is about validation, not the entry point).
    val clean = real.map { case (id, b) => (id, b) }.toSeq
      .toDF("doc_id", "payload")
    val okFormats = operators.TrainQueries.mmGifWalk(clean)
      .select($"format").distinct().collect().map(_.getString(0)).toSet
    assert(okFormats == Set("gif"),
      s"clean payloads did not walk as gif: $okFormats")
  }
}
