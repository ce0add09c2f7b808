package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2.D — aggregation operators (SURVEY.md §2.D).
  *
  * Scale notes: every query here is a groupBy over a declarative plan, so
  * Spark plans a two-phase HashAggregate (partial map-side combine, then
  * final after a shuffle on the grouping keys). At 100 TB the shuffle
  * volume is bounded by the distinct-key cardinality per partition, not
  * the input size — the right shape for a 1000-executor cluster.
  */
object AggQueries extends QueryPack {
  import Det._

  def queries: Seq[(String, Q)] = Seq(
    // TPC-H Q1 shape: hash aggregate with partial+final split.
    "agg_hash" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("2001-09-02").cast(TimestampType))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          sum(money($"l_extendedprice") * (lit(1) - money($"l_discount")))
            .cast(DoubleType).as("sum_disc_price"),
          davg($"l_quantity").as("avg_qty"),
          davg($"l_extendedprice").as("avg_price"),
          davg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    "agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
