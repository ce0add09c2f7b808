package graft

import org.apache.spark.sql.functions._

/** DedupCluster.components on hand-built graphs: chains (worst case
  * for label propagation), cliques, and disjoint pairs must all
  * resolve to min-id components. */
class DedupClusterSpec extends SparkTestBase {

  import spark.implicits._

  test("components labels chains, cliques, and pairs with the min id") {
    // Graph: chain 1-2-3-4-5, triangle 10-11-12 (all edges),
    // pair 20-21, and a mask-style clique 30-31-32 linked by 32-33.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
      (30L, 31L), (30L, 32L), (31L, 32L), (32L, 33L))
      .toDF("da", "db")
    val got = operators.DedupCluster.components(edges)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L)
    assert(got == want)
  }

  test("components converges on a long chain (pointer jumping)") {
    // 64-node chain: naive propagation needs 63 rounds; the bounded
    // 25-round loop only terminates thanks to path halving.
    val chain = (1L until 64L).map(i => (i, i + 1)).toDF("da", "db")
    val got = operators.DedupCluster.components(chain)
    assert(got.filter($"comp" =!= 1L).count() == 0,
      "every chain node must resolve to component 1")
    assert(got.count() == 64)
  }

  test("reliable checkpointing without a checkpoint dir fails fast") {
    // Misconfiguration (no setCheckpointDir) must surface before any
    // round runs, not as a mid-job Spark failure. Declared before the
    // happy-path case: setCheckpointDir is irreversible on a live
    // SparkContext, so this guard is only observable while no test
    // has set one yet.
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "suite ordering left a checkpoint dir set; guard not testable")
    val edges = Seq((1L, 2L)).toDF("da", "db")
    spark.conf.set("spark.graft.dedup.reliableCheckpoint", "true")
    try {
      val e = intercept[IllegalStateException] {
        operators.DedupCluster.components(edges)
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    } finally {
      spark.conf.unset("spark.graft.dedup.reliableCheckpoint")
    }
  }

  test("reliable-checkpoint branch produces identical labels") {
    // The cluster-durability path (df.checkpoint(true) instead of
    // localCheckpoint) must be label-for-label identical to the
    // default on the same chain + clique + pair fixture.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
      (30L, 31L), (30L, 32L), (31L, 32L), (32L, 33L))
      .toDF("da", "db")
    val default = operators.DedupCluster.components(edges)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sc = spark.sparkContext
    val prevDir = sc.getCheckpointDir
    spark.conf.set("spark.graft.dedup.reliableCheckpoint", "true")
    sc.setCheckpointDir(scratch("dedup-reliable-ckpt"))
    try {
      val reliable = operators.DedupCluster.components(edges)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(reliable == default,
        "reliable-checkpoint labels must match the localCheckpoint path")
    } finally {
      spark.conf.unset("spark.graft.dedup.reliableCheckpoint")
      prevDir.foreach(sc.setCheckpointDir)
    }
  }
}
