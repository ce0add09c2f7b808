package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.functions._

/** r16 laws (r15 verdict items 2 and 8):
  *
  *  - hammingDedup's two entropy-collapse guards. Guard 1
  *    (distinct-hash collapse) is EXACT: labels must be bit-identical
  *    to brute-force doc-level components on a fixture dominated by
  *    identical hashes. Guard 2 (hot-bucket canonical star over
  *    representatives, ported from minhashPairs' r11 treatment) is a
  *    declared recall trade: on a constructed skew fixture whose hot
  *    bucket members all sit within the distance ball of the
  *    canonical, cluster membership is INVARIANT between the capped
  *    star and the uncapped clique — the reroute loses edges, never
  *    membership, exactly the law dedup_minhash_cluster rides on.
  *
  *  - vec_knn_ivf_table's IO win as a RUNTIME metric, not just a
  *    plan-time dynamicpruningexpression: after execution, the
  *    cell-partitioned index scan must report having READ strictly
  *    fewer partitions than the table has cells (and at most the
  *    probe fan-out) — a future AQE/statistics change that silently
  *    disables DPP would still return correct rows while scanning
  *    every cell, and only the metric catches it.
  */
class R16OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("hammingDedup distinct-hash collapse is exact " +
       "(== brute-force doc-level components)") {
    // 400 docs over only 12 distinct 16-bit hashes — the mm_dedup
    // entropy-collapse shape in miniature. Hashes 0..3 differ by one
    // bit each (one near-dup cluster); 4..11 are mutually far.
    val near = Seq(0x0000L, 0x0001L, 0x0010L, 0x0100L)
    val far = (0 until 8).map(i => 0x1111L * (i + 1) + 0x4000L * i)
      .map(_ & 0x7FFFL).distinct
    val hashes = (near ++ far).distinct
    val docs = (0 until 400)
      .map(i => (i.toLong, hashes(i % hashes.size)))
      .toDF("doc_id", "hash")
    val got = api.TextDedup.hammingDedup(docs, bits = 16, blocks = 4,
        maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq.sortBy(_._1)
    // Brute force at DOC level: all-pairs popcount gate, components.
    val a = docs.select($"doc_id".as("da"), $"hash".as("ha"))
    val b = docs.select($"doc_id".as("db"), $"hash".as("hb"))
    val brutePairs = a.crossJoin(b).filter($"da" < $"db")
      .filter(expr("bit_count(ha ^ hb)") <= 3)
      .select($"da", $"db")
    val bruteComps = operators.DedupCluster.components(brutePairs)
    val want = docs.select($"doc_id")
      .join(bruteComps, Seq("doc_id"), "left")
      .withColumn("comp", coalesce($"comp", $"doc_id"))
      .withColumn("keep", $"doc_id" === $"comp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq.sortBy(_._1)
    assert(got == want,
      s"collapse changed labels: got ${got.take(8)} want ${want.take(8)}")
    // The law must not be vacuous: the near cluster really clusters.
    assert(got.count(!_._3) > 300, s"fixture has no duplication: $got")
  }

  test("hammingDedup hot-bucket star: cap engages, cluster " +
       "membership invariant (capped == uncapped)") {
    // Skew fixture: canonical hash 0x0000 plus four members one bit
    // away in block 1 — all five share the (zero) buckets of blocks
    // 0, 2, 3, so with bucketCap=2 those buckets exceed the cap and
    // reroute to the canonical star; every member is within distance
    // 1 of the canonical, so star components == clique components.
    // Each hash also carries one duplicate doc (ids 100+) so the
    // distinct-hash collapse is exercised in the same run, and one
    // far hash (0x7700, distance > 3 from everything) shares the hot
    // zero-buckets but must be gated OUT of the star by the exact
    // popcount — a hot hamming bucket is NOT exact-dup-grade.
    val hot = Seq(10L -> 0x0000L, 11L -> 0x0010L, 12L -> 0x0020L,
      13L -> 0x0040L, 14L -> 0x0080L)
    val farDup = Seq(50L -> 0x7700L)
    val base = hot ++ farDup
    val docs = (base ++ base.map { case (id, h) => (id + 100L, h) })
      .toDF("doc_id", "hash")
    def runMap(cap: Int) = api.TextDedup.hammingDedup(docs, bits = 16,
        blocks = 4, maxDist = 3, bucketCap = cap)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    val capped = runMap(2)
    val uncapped = runMap(Int.MaxValue)
    assert(capped == uncapped,
      s"star reroute changed membership:\n  capped $capped\n" +
        s"  uncapped $uncapped")
    // The hot cluster resolves to min id 10; dups follow their reps;
    // the far hash stays its own 2-doc (identical-hash) cluster.
    (10L to 14L).foreach(i => assert(capped(i) == (10L, i == 10L)))
    (110L to 114L).foreach(i => assert(capped(i)._1 == 10L && !capped(i)._2))
    assert(capped(50L) == (50L, true) && capped(150L) == (50L, false),
      s"far hash must not join the star cluster: $capped")
  }

  test("vec_knn_ivf_table probe scan READS only probed cells " +
       "(runtime partition metric, not just plan shape)") {
    // The law that caught two real defects on landing (r16): (1) the
    // unscaled coarse quantizer put every vector in ONE cell, and
    // (2) with the quantizer fixed, reuseBroadcastOnly=true degraded
    // the partition filter to dynamicpruningexpression(TRUE) — the
    // plan still contained "dynamicpruning" (so R15's shape law
    // passed) while the scan read 10/10 cells, 448 files. Only the
    // runtime metric sees either failure. Expected = the probed-cell
    // union from an INDEPENDENT in-test mirror of the probe (oracle
    // arithmetic); sf0.001's 10-query union covers all cells, so the
    // assertion runs at sf0.01 where the union is a strict subset.
    val dir = "/root/testdata/sf0.01"
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("vec_knn_ivf_table")(spark, dir)
      df.collect() // execute: DPP metrics are runtime-populated
      def subtree(p: SparkPlan): Seq[SparkPlan] =
        p +: p.children.flatMap(subtree)
      val scans = subtree(df.queryExecution.executedPlan).collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(
            _.toString.contains("ivf_cells")) => s
      }
      assert(scans.nonEmpty, "no FileSourceScanExec over ivf_cells in " +
        df.queryExecution.executedPlan.toString)
      val scan = scans.head
      val partsRead = scan.metrics.get("numPartitions")
        .map(_.value).getOrElse(
          fail(s"no numPartitions metric; have ${scan.metrics.keys}"))
      val tag = Util.dirTag(dir)
      val totalCells = spark.table(s"ivf_cells_$tag")
        .select($"cell").distinct().count()
      // Independent mirror of the probe: label centroids from
      // 1e-7-quantized means, 3 nearest cells per query (vec_id < 10).
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val cent = e
        .select($"label", posexplode($"embedding").as(Seq("pos", "x")))
        .withColumn("xq", floor($"x".cast("double") * 1e7))
        .groupBy($"label", $"pos")
        .agg(((sum($"xq").cast("double") / count(lit(1))) / lit(1e7))
          .as("cq"))
        .groupBy($"label")
        .agg(transform(array_sort(collect_list(struct($"pos", $"cq"))),
          t => t.getField("cq")).as("carr"))
        .select($"label".as("cl"), $"carr")
      val probedUnion = e.filter($"vec_id" < 10)
        .crossJoin(broadcast(cent))
        .withColumn("d", aggregate(
          zip_with($"embedding", $"carr",
            (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
          lit(0.0), (a, b) => a + b))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"vec_id").orderBy($"d", $"cl")))
        .filter($"rn" <= 3).select($"cl").distinct().count()
      assert(probedUnion < totalCells,
        s"law vacuous here: probe union $probedUnion == total " +
          s"$totalCells — move it to a fixture whose union is a " +
          "strict subset")
      assert(partsRead == probedUnion,
        s"scan read $partsRead partitions, probe admits $probedUnion " +
          s"of $totalCells cells — DPP is not pruning at runtime")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
