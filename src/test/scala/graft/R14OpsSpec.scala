package graft

import org.apache.spark.sql.functions._

/** r14 op laws: `graph_lpa` — synchronous label propagation.
  *
  * Claims to pin:
  *  1. Node set preserved: every graph node gets exactly one label.
  *  2. Labels are node ids (closure: a label can only ever be some
  *     node's id — LPA adopts existing labels, never invents one).
  *  3. Coarsening: the distinct-label count is non-increasing in the
  *     round count and strictly below the node count at the fixture
  *     (communities actually form — non-vacuity).
  *  4. The matvec shape is real: a round does ZERO shuffle writes —
  *     the number of shuffle-writing stages is IDENTICAL for 1 round
  *     and 4 rounds (both pay only the init distinct + the count()
  *     action's final agg; if a round exchanged the edge relation or
  *     the label counts, 3 extra rounds would add shuffle stages).
  *     Runtime metric, not plan shape, because the per-round lineage
  *     truncation (localCheckpoint) hides round plans from the final
  *     DataFrame's tree.
  */
class R14OpsSpec extends SparkTestBase {
  import spark.implicits._

  /** sf0.01, not the usual sf0.001: non-vacuity needs a candidate
    * graph with enough distinct dup clusters for communities to be
    * informative (the 500-doc fixture's pair list is tiny). */
  private val dir = "/root/testdata/sf0.01"

  private def keyed(name: String) =
    SparkEntry.queries(name)(spark, dir)

  /** The same doubled minhash-pair graph the keyed query mines,
    * taken from the independently-oracled dedup_minhash_pairs key
    * (PASS vs DuckDB at every gate SF), not from the LPA code under
    * test. */
  private lazy val ed = {
    val pr = keyed("dedup_minhash_pairs").select($"da", $"db")
    val d = pr.select($"da".as("src"), $"db".as("dst"))
      .unionByName(pr.select($"db".as("src"), $"da".as("dst")))
      .repartition($"dst").cache()
    d.count()
    d
  }

  test("graph_lpa: one label per node, labels are node ids") {
    val got = keyed("graph_lpa").cache()
    val nodes = ed.select($"src".as("node")).distinct()
    assert(got.count() == nodes.count(),
      "graph_lpa must label every node exactly once")
    assert(got.groupBy($"node").count().filter($"count" > 1).count() == 0,
      "duplicate node rows")
    assert(got.select($"comm".as("node")).distinct()
      .join(nodes, Seq("node"), "left_anti").count() == 0,
      "a community label that is not any node's id")
    got.unpersist()
  }

  test("graph_lpa: label set coarsens with rounds, non-vacuously") {
    val nNodes = ed.select($"src").distinct().count()
    val n3 = graft.api.Graph.labelPropagation(ed, 3)
      .select($"lbl").distinct().count()
    val n4 = graft.api.Graph.labelPropagation(ed, 4)
      .select($"lbl").distinct().count()
    assert(n4 <= n3, s"label set grew: $n3 labels after 3 rounds, " +
      s"$n4 after 4 — adopted labels must be a subset of current ones")
    assert(n4 < nNodes,
      s"degenerate fixture: $n4 labels over $nNodes nodes — no mixing")
  }

  test("graph_modularity: exact bounds and internal consistency") {
    val row = keyed("graph_modularity").collect()(0)
    val m2 = row.getAs[Long]("m2")
    val within = row.getAs[Long]("within")
    val dsq = row.getAs[Long]("dsq")
    val q = row.getAs[Double]("modularity_q")
    assert(m2 > 0 && within >= 0 && within <= m2,
      s"within-community edge count $within outside [0, $m2]")
    assert(dsq >= m2, // Σ D_c² ≥ Σ D_c = 2m when every D_c ≥ 1
      s"degree-mass square sum $dsq below edge count $m2")
    assert(q >= -0.5 && q <= 1.0, s"modularity $q outside [-0.5, 1]")
    // Q must beat the one-community partition (Q=0) only if labels
    // actually concentrate edges; at this fixture LPA does — pin
    // non-vacuity so a label-propagation regression can't hide
    // behind a structurally-valid but meaningless Q.
    assert(q > 0.0, s"LPA labels earn non-positive modularity $q — " +
      "communities did not form on the fixture")
  }

  test("graph_lpa rounds are shuffle-free (stage-metrics law)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    def shuffleStages(rounds: Int): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger()
      val done = new java.util.concurrent.atomic.AtomicInteger()
      val l = new SparkListener {
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          if (s.stageInfo.taskMetrics != null &&
              s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten > 0)
            n.incrementAndGet()
          done.incrementAndGet()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        graft.api.Graph.labelPropagation(ed, rounds).count()
        // Listener events are async: poll until the completed-stage
        // count is stable for 500 ms (bounded at 10 s).
        var last = -1; var waited = 0
        while (done.get() != last && waited < 10000) {
          last = done.get(); Thread.sleep(500); waited += 500
        }
      } finally spark.sparkContext.removeSparkListener(l)
      n.get()
    }
    val s1 = shuffleStages(1)
    val s4 = shuffleStages(4)
    assert(s4 == s1,
      s"LPA rounds must not shuffle: $s1 shuffle-writing stages at " +
        s"1 round but $s4 at 4 — a round is exchanging edge-sized data")
  }
}
