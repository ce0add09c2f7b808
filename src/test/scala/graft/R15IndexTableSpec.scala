package graft

import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** r15 laws: the ANN/dedup index artifacts persisted as WRITTEN
  * tables (verdict item 3 — the graph_jaccard_bucketed discipline
  * applied to the vector/LSH indexes).
  *
  * Per layout-variant key, two claims:
  *  1. LAYOUT, not semantics: output equals the session-cached twin
  *     row-for-row (both also share one oracle SQL, so DuckDB proves
  *     each independently — this law proves them against each other
  *     without an engine in between).
  *  2. The layout buys the plan it promises:
  *     - vec_knn_ivf_table: the probe join's scan of the
  *       cell-PARTITIONED table carries a dynamicpruningexpression —
  *       only probed cells' directories are listed/scanned (an IVF
  *       probe's whole point is reading 3/256 of the index, and a
  *       silently-disabled DPP still returns correct rows while
  *       scanning everything).
  *     - vec_ivfpq_bucketed / dedup_minhash_pairs_bucketed: the
  *       corpus-sized index side of the candidate join reads its
  *       bucket files directly — the SMJ has ZERO shuffle exchange
  *       and ZERO sort on that side (one file per bucket + persisted
  *       sortBy is what lets Spark credit the order).
  */
class R15IndexTableSpec extends SparkTestBase {

  private def keyed(name: String) =
    SparkEntry.queries(name)(spark, sf)

  /** Static (AQE-off) executed plan — AdaptiveSparkPlanExec is a
    * TreeNode leaf that hides its subtree from traversal, and these
    * are plan-SHAPE assertions anyway (R13OpsSpec precedent). */
  private def staticPlan(name: String): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try keyed(name).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def subtree(p: SparkPlan): Seq[SparkPlan] =
    p +: p.children.flatMap(subtree)

  /** The SMJ whose equi-key mentions `keyFrag`, its index-table side
    * identified by `scanFrag` appearing in that child's subtree; the
    * law is zero Exchange + zero Sort on THAT side. */
  private def assertIndexSideClean(plan: SparkPlan, keyFrag: String,
      scanFrag: String): Unit = {
    val smj = subtree(plan).collect {
      case j: SortMergeJoinExec
        if j.leftKeys.exists(_.toString.contains(keyFrag)) ||
           j.rightKeys.exists(_.toString.contains(keyFrag)) => j
    }
    val withScan = smj.flatMap { j =>
      j.children.filter(c => subtree(c).exists(_.toString
        .contains(scanFrag)))
    }
    assert(withScan.nonEmpty,
      s"no SortMergeJoin on $keyFrag with a $scanFrag side in:\n$plan")
    withScan.foreach { side =>
      val under = subtree(side)
      val shuffles = under.collect { case e: ShuffleExchangeExec => e }
      val sorts = under.collect { case s: SortExec => s }
      assert(shuffles.isEmpty,
        s"index-table side must not shuffle, found ${shuffles.size}:\n$plan")
      assert(sorts.isEmpty,
        s"bucketed+sorted index side must not re-sort, " +
          s"found ${sorts.size}:\n$plan")
    }
  }

  test("vec_knn_ivf_table == vec_knn_ivf (layout variant)") {
    assertSameRows(keyed("vec_knn_ivf_table"), keyed("vec_knn_ivf"),
      "table vs cached ivf")
  }

  test("vec_knn_ivf_table probe scan dynamic-prunes to probed cells") {
    val p = staticPlan("vec_knn_ivf_table").toString
    assert(p.contains("dynamicpruning"),
      s"no dynamicpruningexpression on the cell-partitioned scan:\n$p")
  }

  test("vec_ivfpq_bucketed == vec_ivfpq (layout variant)") {
    assertSameRows(keyed("vec_ivfpq_bucketed"), keyed("vec_ivfpq"),
      "bucketed vs cached ivfpq")
  }

  test("vec_ivfpq_bucketed code join is exchange- and sort-free on " +
       "the codes side") {
    assertIndexSideClean(staticPlan("vec_ivfpq_bucketed"),
      keyFrag = "c_id#", scanFrag = "pq8_codes_")
  }

  test("dedup_minhash_pairs_bucketed == dedup_minhash_pairs " +
       "(layout variant)") {
    assertSameRows(keyed("dedup_minhash_pairs_bucketed"),
      keyed("dedup_minhash_pairs"), "bucketed vs cached minhash pairs")
  }

  test("dedup_minhash_pairs_bucketed band self-join is exchange- and " +
       "sort-free on BOTH sides") {
    val plan = staticPlan("dedup_minhash_pairs_bucketed")
    val smjOnBand = subtree(plan).collect {
      case j: SortMergeJoinExec
        if j.leftKeys.exists(_.toString.contains("bi#")) => j
    }
    assert(smjOnBand.nonEmpty,
      s"expected a SortMergeJoin on the band key (bi, bv) in:\n$plan")
    val under = smjOnBand.flatMap(subtree)
    val shuffles = under.collect { case e: ShuffleExchangeExec => e }
    val sorts = under.collect { case s: SortExec => s }
    assert(shuffles.isEmpty,
      s"bucketed band self-join must not shuffle, " +
        s"found ${shuffles.size}:\n$plan")
    assert(sorts.isEmpty,
      s"one-file-per-bucket + sortBy must elide the SMJ sorts, " +
        s"found ${sorts.size}:\n$plan")
  }
}
