package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2.C — join operators (SURVEY.md §2.C).
  *
  * Scale notes: dimension tables (region/nation/part/supplier) are
  * explicitly `broadcast()` so the big fact side never shuffles for
  * them; only fact⋈fact joins (lineitem⋈orders) shuffle, and they
  * shuffle on the join key so AQE can coalesce/skew-split at runtime.
  */
object JoinQueries extends QueryPack {
  import Det._

  /** TPC-H Q5-shape star join: revenue per (region, nation).
    * Flagship query — also used by SparkEntry.entry (driver smoke). */
  def joinMultiway(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    val r = Tables.load(s, dir, "region")
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .join(c, $"o_custkey" === $"c_custkey")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
              $"o_orderdate" <  lit("1997-01-01").cast(TimestampType))
      .groupBy($"r_name", $"n_name")
      .agg(
        sum(money($"l_extendedprice") * (lit(1) - money($"l_discount")))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_rows"))
      .orderBy($"r_name", $"n_name")
  }

  def queries: Seq[(String, Q)] = Seq(
    "join_multiway" -> (joinMultiway _)
  )

  def oracle: Seq[(String, String)] = Seq(
    "join_multiway" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |JOIN orders   ON l_orderkey  = o_orderkey
        |JOIN customer ON o_custkey   = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin
  )
}
