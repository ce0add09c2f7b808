package graft.operators
import graft.Tables
import org.apache.spark.sql.SparkSession
/** Scratch diagnostic (r6 scale experiment): edge-relation cardinality
  * of the dedup_components graph at two scales. */
object EdgeCount {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val e = DedupCluster.dupEdges(spark, dir)
      val n = e.count()
      val comps = DedupCluster.components(e)
      import spark.implicits._
      val stats = comps.groupBy($"comp").count()
        .agg(org.apache.spark.sql.functions.count($"comp").as("n_comps"),
             org.apache.spark.sql.functions.max($"count").as("max_sz"))
        .head()
      println(s"[edgecount] $dir edges=$n comps=${stats.getLong(0)} maxComp=${stats.getLong(1)}")
    }
    spark.stop()
  }
}
