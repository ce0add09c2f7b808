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
}
