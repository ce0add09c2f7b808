package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of one or more
  * query keys (default: a headline set). Usage:
  *   runMain graft.Explain [sfDir] [key ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val keys =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("scan_pruned", "join_multiway", "agg_hash",
        "win_topk_pergroup", "dedup_near", "vec_knn_ivf",
        "agg_percentile", "text_tfidf", "join_asof_native",
        "join_theta_range", "text_contamination", "ts_resample",
        "dedup_minhash", "dedup_minhash_pairs", "dedup_minhash_cluster",
        "pipeline_neardup", "scan_time_range",
        "dim_lookup_pit", "graph_kcore", "vec_rerank_mmr",
        "join_spatial_grid", "agg_active_users", "text_bpe_merges")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"\n===== $k =====")
      SparkEntry.queries(k)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
