package graft

/** r13 op laws: `graph_jaccard_bucketed` — the written, p-bucketed
  * membership layout for the pair self-join.
  *
  * Two claims to pin:
  *  1. LAYOUT, not semantics: the bucketed variant's output equals
  *     graph_jaccard's row-for-row (both also share one oracle SQL,
  *     so DuckDB proves each independently — this law proves them
  *     against each other without an engine in between).
  *  2. The layout actually buys the plan it promises: the pair
  *     self-join subtree over the bucketed table is SMJ with ZERO
  *     shuffle exchange and ZERO sort under it — the bucket files ARE
  *     the partitioning (repartition(buckets, p) at write time makes
  *     one file per bucket, which is what lets Spark credit the
  *     persisted `sortBy` order too).
  */
class R13OpsSpec extends SparkTestBase {

  private def keyed(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("graph_jaccard_bucketed == graph_jaccard (layout variant)") {
    assertSameRows(keyed("graph_jaccard_bucketed"), keyed("graph_jaccard"),
      "bucketed vs cached jaccard")
  }

  test("bucketed pair self-join is exchange-free and sort-free") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    // AQE's root node hides its subtree from TreeNode traversal
    // (AdaptiveSparkPlanExec is a leaf); plan-SHAPE assertions want
    // the static plan anyway, so build this one query with AQE off.
    val plan = {
      val prev = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try keyed("graph_jaccard_bucketed").queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    }
    // The pair stage is the SMJ whose equi-key is the bucket column p
    // (the degree joins downstream are keyed on sup).
    def subtree(p: SparkPlan): Seq[SparkPlan] = p +: p.children.flatMap(subtree)
    val smjOnP = subtree(plan).collect {
      case j: SortMergeJoinExec
        if j.leftKeys.exists(_.toString.contains("p#")) => j
    }
    assert(smjOnP.nonEmpty,
      s"expected a SortMergeJoin on the bucket column p in:\n$plan")
    val under = smjOnP.flatMap(subtree)
    val shuffles = under.collect { case e: ShuffleExchangeExec => e }
    val sorts = under.collect { case s: SortExec => s }
    assert(shuffles.isEmpty,
      s"bucketed self-join must not shuffle, found ${shuffles.size}:\n$plan")
    assert(sorts.isEmpty,
      s"one-file-per-bucket + sortBy must elide the SMJ sorts, " +
        s"found ${sorts.size}:\n$plan")
  }
}
