package graft

/** Plan-REGRESSION gate over the full key surface (r10 verdict item
  * 7): PlanShapeSpec pins ~20 load-bearing plan properties by hand;
  * this suite snapshots a normalized shape signature — node-type
  * counts that encode the scale design: join strategies, shuffle /
  * broadcast exchange counts, aggregate / window / sort / generate
  * counts — for EVERY SparkEntry key and diffs against the committed
  * snapshot, so an unintended strategy flip (broadcast→SMJ, a new
  * shuffle, a cartesian) in ANY key fails CI by name even when no
  * hand-written assertion covers it.
  *
  * The signature is deliberately a count vector, not the plan text:
  * expression ids, statistics and codegen stage ids churn per build,
  * but the node-type counts only change when Catalyst actually picks
  * a different plan shape. Counts come from the pre-execution
  * `executedPlan` (AQE initial plan — runtime re-plans are AQE's job
  * and not a regression).
  *
  * Intentional plan changes: regenerate with
  * `SPARK_GRAFT_PLAN_REGEN=1 sbt "testOnly graft.PlanSnapshotSpec"`
  * and commit the diff of src/test/resources/plan_snapshots.tsv —
  * the diff IS the review artifact.
  */
class PlanSnapshotSpec extends SparkTestBase {

  private val snapshotPath =
    java.nio.file.Paths.get("src/test/resources/plan_snapshots.tsv")

  /** (token label, regex counting that node in a physical plan). */
  private val nodePatterns: Seq[(String, scala.util.matching.Regex)] = Seq(
    "bhj"  -> """BroadcastHashJoin""".r,
    "smj"  -> """SortMergeJoin""".r,
    "shj"  -> """ShuffledHashJoin""".r,
    "bnl"  -> """BroadcastNestedLoopJoin""".r,
    "cart" -> """CartesianProduct""".r,
    "xchg" -> """Exchange (hash|range|Single)""".r,
    "bx"   -> """BroadcastExchange""".r,
    "agg"  -> """(HashAggregate|ObjectHashAggregate|SortAggregate)\(""".r,
    "win"  -> """\bWindow \[""".r,
    "wgl"  -> """WindowGroupLimit""".r,
    "sort" -> """\bSort \[""".r,
    "gen"  -> """\bGenerate """.r,
    "topk" -> """TakeOrderedAndProject""".r,
    "imts" -> """InMemoryTableScan""".r,
    "scan" -> """FileScan""".r)

  private def signature(plan: String): String =
    nodePatterns.map { case (label, re) =>
      s"$label=${re.findAllMatchIn(plan).size}"
    }.mkString(" ")

  test("every key's physical plan shape matches the committed snapshot") {
    // Deterministic starting state: the shared test session's memoized
    // index relations (SessionCache) depend on which suites ran
    // before; plans below must only depend on THIS suite's own sorted
    // key iteration (a key that caches an index makes later consumers
    // show InMemoryTableScan — deterministically, same order, every
    // run).
    SessionCache.clear(spark)
    val got: Seq[(String, String)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (key, fn) =>
        key -> signature(
          fn(spark, sf).queryExecution.executedPlan.toString)
      }
    if (sys.env.get("SPARK_GRAFT_PLAN_REGEN").contains("1")) {
      java.nio.file.Files.createDirectories(snapshotPath.getParent)
      java.nio.file.Files.writeString(snapshotPath,
        got.map { case (k, s) => s"$k\t$s" }.mkString("", "\n", "\n"))
      info(s"regenerated ${got.size} snapshots at $snapshotPath")
    } else {
      assert(java.nio.file.Files.exists(snapshotPath),
        s"no committed snapshot at $snapshotPath — run with " +
          "SPARK_GRAFT_PLAN_REGEN=1 once and commit it")
      val want: Map[String, String] =
        scala.io.Source.fromFile(snapshotPath.toFile).getLines()
          .filter(_.nonEmpty)
          .map { l => val Array(k, s) = l.split("\t", 2); k -> s }
          .toMap
      val missing = got.map(_._1).filterNot(want.contains)
      assert(missing.isEmpty,
        s"keys missing from the snapshot (regen + review): $missing")
      val gone = want.keySet -- got.map(_._1)
      assert(gone.isEmpty,
        s"snapshot has keys that no longer exist (regen + review): $gone")
      val diffs = got.collect {
        case (k, s) if want(k) != s =>
          s"$k:\n  committed ${want(k)}\n  current   $s"
      }
      assert(diffs.isEmpty,
        s"${diffs.size} plan shape(s) drifted — if intended, " +
          "SPARK_GRAFT_PLAN_REGEN=1 + commit; if not, a strategy " +
          "regression:\n" + diffs.mkString("\n"))
    }
  }
}
