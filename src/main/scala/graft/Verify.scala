package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle width decouples from thread count for at-scale dumps
    // (the 100x staging wants ~10 partitions per core so partition
    // bytes match the driver-fixture runs; the driver sets nothing,
    // so its runs keep parts = cpus).
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev loop: SPARK_GRAFT_ONLY=k1,k2 dumps just those keys (the
    // driver sets nothing, so its runs always dump everything).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // SPARK_GRAFT_DIGEST=k1,k2 (dev loop; r13): for keys whose full
    // result is too large to dump+compare row-wise (dedup_hamming at
    // the 100x staging emits ~10^9.5 candidate pairs — the saturated
    // 16-bit space's own output), reduce to an order-independent
    // digest: count(*) plus, per INTEGER column c, sum(c) and
    // sum(c*c), each mod 2^61-1 in DECIMAL(38,0) (exact — no value
    // here exceeds 10^25 < 10^38). dev/check.py wraps the DuckDB
    // oracle in the IDENTICAL reduction, so the full workload still
    // executes on both engines; only the comparison is compressed.
    // Contract: non-negative integer columns only (mod of negatives
    // diverges across engines).
    val digestKeys = sys.env.get("SPARK_GRAFT_DIGEST")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    def digest(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      val p = lit(new java.math.BigDecimal("2305843009213693951"))
      val intCols = df.schema.fields.collect {
        case f if Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(f.dataType) => f.name
      }
      require(intCols.nonEmpty, "digest needs >=1 integer column")
      val aggs = count(lit(1)).as("n") +: intCols.toSeq.flatMap { c =>
        // Per-element mod BEFORE the sum (r13 ADVICE), then an
        // EXPLICIT widen to DECIMAL(38,0) (r14 ADVICE): Spark sums a
        // Decimal(s, 0) input in Decimal(s+10, 0), so without the cast
        // the accumulator is only Decimal(29,0) and a running sum of
        // near-p terms (~2.3e18 each) silently NULLs (non-ANSI) past
        // ~4.3e10 rows. With the cast the accumulator really has 38
        // digits: d < p ≈ 2.3e18 and d*d%p < p, so ~4.3e19 rows of
        // worst-case terms fit — far beyond any staging. Must stay in
        // lockstep with dev/check.py digest_sql (same reduction).
        val d = (col(c).cast(DecimalType(19, 0)) % p)
          .cast(DecimalType(38, 0))
        Seq((sum(d) % p).cast("long").as(s"s_$c"),
          (sum((d * d) % p) % p).cast("long").as(s"q_$c"))
      }
      df.agg(aggs.head, aggs.tail: _*)
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val res = fn(spark, sfDir)
        (if (digestKeys.contains(name)) digest(res) else res)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SessionCache.clear(spark) // release session-scoped index caches
    spark.stop()
  }
}
