package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Reusable similarity-search building blocks — the public surface
  * behind the oracled `vec_*` keys (SURVEY.md §2.H). Brute-force
  * cosine top-k with a broadcast query side is the exact baseline; the
  * IVF / IVF-PQ scale paths in `operators.LlmQueries` compose the same
  * arithmetic (codegen `fdot`/`fnorm2` sequential folds, so results
  * are bit-stable regardless of partitioning).
  */
object VectorSearch {

  /** Exact cosine top-k: for every query row, the k nearest corpus
    * rows by cosine similarity (ties broken by ascending corpus id —
    * total order, engine-independent). The query side must be bounded
    * (it is broadcast); the corpus streams — at 100 TB this is one
    * scan, no shuffle of the corpus. Self-matches (equal ids) are
    * excluded. Output: (q_id, rank, c_id, cos). */
  def knnCosine(queries: DataFrame, corpus: DataFrame, k: Int,
      qIdCol: String = "q_id", qVecCol: String = "qe",
      cIdCol: String = "c_id", cVecCol: String = "ce"): DataFrame = {
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val q = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("qe"))
      .withColumn("qss", expr("fnorm2(qe)"))
    val c = corpus.select(col(cIdCol).as("c_id"), col(cVecCol).as("ce"))
      .withColumn("css", expr("fnorm2(ce)"))
    broadcast(q).crossJoin(c).filter(col("q_id") =!= col("c_id"))
      .withColumn("dot", expr("fdot(qe, ce)"))
      .withColumn("cos", col("dot") / sqrt(col("qss") * col("css")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id"))).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("cos"))
  }
}
