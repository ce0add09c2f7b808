package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2.B — projection / filter / predicate operators (SURVEY.md §2.B).
  *
  * Scale notes: all predicates here are Catalyst-pushable — they reach
  * the parquet scan as PushedFilters and skip row groups at 100 TB.
  * Projections prune the read schema to only referenced columns.
  */
object FilterQueries extends QueryPack {
  import Det._

  def queries: Seq[(String, Q)] = Seq(
    // Projection with computed columns + aliasing.
    "project_compute" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select(
          $"l_orderkey", $"l_linenumber", $"l_quantity",
          (money($"l_extendedprice") * (lit(1) - money($"l_discount")))
            .cast(DoubleType).as("revenue"),
          (money($"l_extendedprice") * money($"l_tax"))
            .cast(DoubleType).as("tax_amt"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixtures —
        // order by every output column so the sort is total-by-content
        // (SURVEY.md 7.4 P2).
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity",
                 $"revenue", $"tax_amt")
    }),

    // Comparison + boolean predicate combinations.
    "filter_basic" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter(($"l_quantity" > 45 && $"l_discount" <= 0.02) ||
                (!($"l_returnflag" === "A") && $"l_linestatus" =!= "O" &&
                 $"l_tax" === 0.0))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
                $"l_discount", $"l_tax", $"l_returnflag", $"l_linestatus")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity",
                 $"l_discount", $"l_tax", $"l_returnflag",
                 $"l_linestatus")
    }),

    // IN / LIKE / BETWEEN / IS NULL predicates.
    "filter_in_like_between" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .filter($"o_orderstatus".isin("O", "F") &&
                ($"o_orderpriority".like("1-%") ||
                 $"o_orderpriority".like("%HIGH%")) &&
                $"o_orderdate".between(
                  lit("1997-01-01").cast(TimestampType),
                  lit("1998-12-31").cast(TimestampType)) &&
                nullif($"o_orderstatus", lit("P")).isNotNull)
        .select($"o_orderkey", $"o_orderstatus", $"o_orderpriority")
        .orderBy($"o_orderkey")
    }),

    // CASE WHEN tiering + coalesce / nullif / greatest / least.
    "filter_conditional" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select(
          $"o_orderkey",
          when($"o_totalprice" > 300000, "high")
            .when($"o_totalprice" > 100000, "mid")
            .otherwise("low").as("tier"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("OPEN"))
            .as("status_x"),
          greatest($"o_totalprice", lit(50000.0)).as("gx"),
          least($"o_totalprice", lit(50000.0)).as("lx"))
        .orderBy($"o_orderkey")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    "project_compute" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS tax_amt
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, revenue, tax_amt""".stripMargin,

    "filter_basic" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax,
        |       l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE (l_quantity > 45 AND l_discount <= 0.02)
        |   OR (NOT (l_returnflag = 'A') AND l_linestatus <> 'O' AND l_tax = 0.0)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_tax, l_returnflag, l_linestatus""".stripMargin,

    "filter_in_like_between" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus IN ('O','F')
        |  AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '%HIGH%')
        |  AND o_orderdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1998-12-31'
        |  AND NULLIF(o_orderstatus, 'P') IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "filter_conditional" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 100000 THEN 'mid'
        |       ELSE 'low' END AS tier,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_x,
        |  GREATEST(o_totalprice, 50000.0) AS gx,
        |  LEAST(o_totalprice, 50000.0) AS lx
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin
  )
}
