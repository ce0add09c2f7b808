package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see SURVEY.md §2 (operator inventory) and §7
  * (build plan). Queries live in per-family QueryPacks; this object
  * only assembles them.
  */
object SparkEntry {

  /** All operator families. Order is the bench/verify execution order. */
  val packs: Seq[QueryPack] = Seq(
    operators.FilterQueries,
    operators.AggQueries,
    operators.JoinQueries,
    operators.SortSetQueries,
    operators.WindowQueries,
    operators.FnQueries,
    operators.SourceSinkQueries,
    operators.LlmQueries,
    operators.TrainQueries,
    operators.SqlQueries,
    operators.MiscQueries,
    operators.PipelineQueries,
    operators.SensorQueries,
    operators.DedupCluster,
    operators.GraphQueries,
    operators.CurationQueries,
    operators.WarehouseQueries)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.JoinQueries.joinMultiway(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** DuckDB-equivalent SQL per oracled key (same column names + ORDER BY
    * as the Spark query — the driver hash-compares after sorting columns
    * by name). Keys absent here get a rows-only check. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
