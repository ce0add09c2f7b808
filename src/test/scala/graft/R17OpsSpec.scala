package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

/** r17 laws (r16 verdict items 3 and 4):
  *
  *  - mm_audio's payloads pinned BYTE-EXACT against an independent
  *    java.nio ByteBuffer(LITTLE_ENDIAN) RIFF writer. The DuckDB
  *    oracle proves decode(synthesize(params)) == params, which a
  *    CONSISTENT byte-order bug survives (a both-sides-big-endian
  *    implementation still self-agrees); only equality against an
  *    independently-built WAV file proves the bytes are the public
  *    little-endian layout a real reader would accept.
  *
  *  - scan_bloom_idx's two storage-level skips as RUNTIME
  *    numOutputRows metrics with in-test mirrors and disabled-reader
  *    controls (the r16 discipline that caught the DPP no-op): a
  *    silently-unwritten bloom or silently-ignored column index
  *    returns correct rows while reading 8x the bytes, invisible to
  *    both the oracle and the plan string.
  */
class R17OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def subtree(p: SparkPlan): Seq[SparkPlan] =
    p +: p.children.flatMap(subtree)

  /** Rows the parquet scan MATERIALIZED (post row-group/page skip,
    * pre Filter), plus the result count, for a 3-key point probe of
    * `path` under per-relation reader options. */
  private def probeScanRows(path: String, keys: Seq[Long],
      opts: Map[String, String]): (Long, Long) = {
    val rd = opts.foldLeft(spark.read) { case (r, (k, v)) => r.option(k, v) }
    val df = rd.parquet(path).filter($"o_orderkey".isin(keys: _*))
    val matched = df.count()
    // count() plans its own scan; re-execute via collect on df so the
    // executedPlan we inspect is the one that ran.
    df.collect()
    val scans = subtree(df.queryExecution.executedPlan).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
    (scans.head.metrics("numOutputRows").value, matched)
  }

  test("mm_audio payloads byte-equal an independent little-endian " +
       "ByteBuffer RIFF/WAVE writer") {
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = operators.TrainQueries.mmAudioPayloads(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(got.keySet == docs.keySet,
      s"payload doc set differs: ${got.size} vs ${docs.size}")
    docs.foreach { case (id, text) =>
      val sr = Seq(8000, 16000, 44100)((id % 3).toInt)
      val ch = 1 + (id % 2).toInt
      val nf = 4 + (id % 13).toInt
      val nv = ch * nf
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * nv)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + 2 * nv)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1); bb.putShort(ch.toShort); bb.putInt(sr)
      bb.putInt(sr * ch * 2); bb.putShort((ch * 2).toShort); bb.putShort(16)
      bb.put("data".getBytes("US-ASCII")); bb.putInt(2 * nv)
      (0 until nv).foreach { i =>
        val v = (text.charAt(i % text.length).toInt * 53 + i * 101) % 4001 -
          2000
        bb.putShort(v.toShort)
      }
      assert(java.util.Arrays.equals(got(id), bb.array()),
        s"doc $id: payload differs from the independent RIFF writer " +
          s"(got ${got(id).take(48).map(b => f"${b & 0xff}%02x").mkString} " +
          s"want ${bb.array().take(48).map(b => f"${b & 0xff}%02x").mkString})")
    }
    // Non-vacuity: both channel counts, all three rates, varied sizes.
    assert(docs.keys.map(_ % 3).toSet.size == 3 &&
      docs.keys.map(_ % 2).toSet.size == 2)
  }

  test("scan_bloom_idx: bloom filter skips row groups at RUNTIME " +
       "(metric == file mirror; disabled-bloom control reads all)") {
    // sf0.01: 15000 orders over 8 hash-scattered files whose key
    // ranges all span ~the full domain — stats cannot prune, the
    // bloom must. The assertion is on the sf0.01 staging because
    // skipping granularity is the row group: more rows = sharper
    // separation, same files the oracled key probes.
    val dir = "/root/testdata/sf0.01"
    val (scatter, _, keys) =
      operators.SourceSinkQueries.stageBloomIdx(spark, dir)
    // Independent mirror: per part-file row count + key membership.
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
    val (controlRows, matchedC) =
      probeScanRows(scatter, keys, Map("parquet.filter.bloom.enabled" -> "false"))
    assert(matched == matchedC && matched >= 2,
      s"probe results differ or degenerate: $matched vs $matchedC")
    // Bloom has no false negatives: every key-bearing group is read.
    // FP slack: <= 2 extra groups at the configured ndv/fpp.
    assert(bloomRows >= expected && bloomRows <= expected + 2 * maxFile,
      s"bloom scan read $bloomRows rows; mirror expects $expected " +
        s"(+<=${2 * maxFile} FP slack) of $total")
    assert(controlRows == total,
      s"control (bloom read disabled) read $controlRows of $total — " +
        "something else is pruning; the attribution law is broken")
  }

  test("scan_bloom_idx: column index skips PAGES within surviving " +
       "row groups (metric strictly below disabled-index control)") {
    val dir = "/root/testdata/sf0.01"
    val (_, sorted, keys) =
      operators.SourceSinkQueries.stageBloomIdx(spark, dir)
    val (idxRows, matched) = probeScanRows(sorted, keys, Map.empty)
    val (controlRows, matchedC) = probeScanRows(sorted, keys,
      Map("parquet.filter.columnindex.enabled" -> "false"))
    assert(matched == matchedC && matched >= 2)
    // Control = full surviving row groups (range-partitioned files
    // containing the keys, ~1875 rows each); with 100-row pages the
    // indexed read keeps ~1 page per key. 3x is a loose floor — the
    // measured separation is ~10x; the law just has to catch "index
    // silently ignored" (ratio 1.0).
    assert(idxRows * 3 <= controlRows,
      s"column index read $idxRows vs control $controlRows — pages " +
        "are not being skipped")
    assert(idxRows >= matched, s"scan rows $idxRows < matches $matched")
  }
}
