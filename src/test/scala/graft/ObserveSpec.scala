package graft

import org.apache.spark.sql.functions._

/** `Dataset.observe` (CollectMetrics): data-quality counters that
  * piggyback on an existing job — at 100 TB the ingest must not pay a
  * second scan just to count rejects, so observed metrics ARE the
  * monitoring surface. Verified against a direct aggregation of the
  * same data.
  */
class ObserveSpec extends SparkTestBase {
  import spark.implicits._

  test("observed ingest counters equal a direct aggregation, same job") {
    val li = Tables.load(spark, sf, "lineitem")
    val observed = li.observe("ingest",
      count(lit(1)).as("n_rows"),
      sum(when($"l_quantity" > 45, 1L).otherwise(0L)).as("n_big"),
      Det.dsum($"l_extendedprice").as("sum_price"))
    // The observation rides the SAME action that does the real work —
    // here a filter standing in for the pipeline's output job. Metrics
    // live on the EXECUTED QueryExecution (count() would build a new
    // one and leave the original unexecuted).
    val out = observed.filter($"l_discount" > 0.02)
    val kept = out.collect().length.toLong
    val m = out.queryExecution.observedMetrics("ingest")
    val direct = li.agg(
      count(lit(1)).as("n_rows"),
      sum(when($"l_quantity" > 45, 1L).otherwise(0L)).as("n_big"),
      Det.dsum($"l_extendedprice").as("sum_price")).head()
    assert(m.getAs[Long]("n_rows") == direct.getAs[Long]("n_rows"))
    assert(m.getAs[Long]("n_big") == direct.getAs[Long]("n_big"))
    assert(m.getAs[Double]("sum_price") ==
      direct.getAs[Double]("sum_price"))
    // The metrics cover ALL rows seen, not just the filtered output.
    assert(kept < m.getAs[Long]("n_rows"))
  }
}
