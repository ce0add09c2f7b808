package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off 10x scale-evidence harness (SURVEY.md's 100-TB mandate,
  * r5 verdict item 8): stages an sf1-equivalent corpus from sf0.1 and
  * times the dedup family + pipeline composition against it, so the
  * "blocked plans scale linearly" claims in PLANS.md rest on measured
  * wall-times, not plan-shape argument alone.
  *
  * Staging (untimed, deterministic, /tmp only):
  * - `documents` x M replicas. Replica i > 0 suffixes every token with
  *   `~r<i>` and offsets doc_id by i*10^7, so the M term spaces are
  *   DISJOINT: no minhash band, simhash block, fingerprint or gram key
  *   ever collides across replicas. Each replica keeps sf0.1's full
  *   within-replica duplicate structure, so candidate-pair and
  *   component outputs scale exactly linearly in M — wall-time vs M
  *   then isolates the ENGINE's scaling, not a workload change.
  *   (Naive row duplication would instead inflate every duplicate
  *   cluster M-fold and grow pair outputs quadratically.)
  * - `embeddings` x M replicas: dims 0..3 sign-flipped by the bits of
  *   i, so replicas of one vector land in different sign-LSH buckets
  *   (dedup_embed's candidate join never crosses replicas; cosine
  *   within replicas is unchanged).
  * - remaining tables: symlinked from the base sf dir (pipeline keys
  *   that touch orders/events read the base-scale table — they are
  *   not the operators under test here).
  *
  * Single-run protocol (not min-of-3): this is a one-off evidence run;
  * first-run planning noise is quoted as-is and compared against the
  * ~10x-scaled sf0.1 MEDIANS from BENCH_r05/target/bench.json.
  */
object ScaleBench {
  val keys: Seq[String] = Seq(
    "dedup_exact", "dedup_near", "dedup_minhash", "dedup_simhash",
    "dedup_hamming", "dedup_hamming64", "dedup_ngram", "dedup_embed",
    "dedup_components", "dedup_apply", "text_contamination",
    "pipeline_corpus",
    // text/sketch/vector families over the 10x corpus (embeddings
    // replicate too, so vec_* keys run at genuine 10x)
    "text_tfidf", "text_langid", "sketch_cms",
    "vec_pq", "vec_knn_ivf", "vec_centroid",
    // r7 additions that read the replicated tables: BM25 retrieval,
    // the IVF-PQ ANN composition, and binary frame sampling
    "text_bm25", "vec_ivfpq", "mm_framesample",
    // r7b additions over documents/embeddings: span-level dedup,
    // reference containment, MIPS retrieval, perceptual hashing,
    // and balanced downsampling
    "text_dupspans", "dedup_containment", "vec_mips",
    "mm_ahash", "sample_balanced")

  def stage(spark: SparkSession, base: String, out: String, m: Int): Unit = {
    import spark.implicits._
    val outP = Paths.get(out)
    if (Files.exists(outP)) {
      // deterministic rebuild — stale staging must never leak between runs
      import scala.jdk.CollectionConverters._
      Files.walk(outP).iterator().asScala.toSeq.reverse
        .foreach(p => Files.delete(p))
    }
    Files.createDirectories(outP)
    val docs = Tables.load(spark, base, "documents")
    val reps = spark.range(0, m).select($"id".cast("int").as("rep"))
    val staged = docs.crossJoin(broadcast(reps))
      .select(
        ($"doc_id" + $"rep".cast("long") * 10000000L).as("doc_id"),
        when($"rep" === 0, $"text").otherwise(
          array_join(transform(split($"text", " "),
            w => concat(w, lit("~r"), $"rep")), " ")).as("text"),
        $"lang", $"source")
      .withColumn("n_chars", length($"text"))
    staged.repartition(32).write.parquet(s"$out/documents.parquet")
    val embs = Tables.load(spark, base, "embeddings")
    embs.crossJoin(broadcast(reps))
      .select(
        ($"vec_id" + $"rep".cast("long") * 10000000L).as("vec_id"),
        expr("transform(embedding, (x, j) -> CASE WHEN j < 4 AND " +
          "shiftright(rep, CAST(j AS INT)) % 2 = 1 THEN -x ELSE x END)")
          .as("embedding"),
        $"label")
      .repartition(8).write.parquet(s"$out/embeddings.parquet")
    Tables.schemas.keys.filterNot(Set("documents", "embeddings")).foreach {
      t => Files.createSymbolicLink(
        Paths.get(s"$out/$t.parquet"), Paths.get(s"$base/$t.parquet"))
    }
  }

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    stage(spark, base, out, mult)
    val counts = Seq("documents", "embeddings")
      .map(t => t -> Tables.load(spark, out, t).count()).toMap
    val results = keys.map { name =>
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, out).count(); true }
               catch { case _: Throwable => false }
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      println(f"  $name%-20s ${if (ok) f"$sec%8.2f s" else "FAILED"}")
      name -> sec
    }
    def fmt(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"scale_total","value":${fmt(total)},""" +
      s""""unit":"sec","mult":$mult,"docs":${counts("documents")},""" +
      s""""vecs":${counts("embeddings")},"queries":$qs,"base":"$base"}"""
    Files.createDirectories(Paths.get("target"))
    Files.writeString(Paths.get("target/scalebench.json"), json)
    println(json)
    spark.stop()
  }
}
