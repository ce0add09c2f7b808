package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** EP2 SQL-surface operators (SURVEY.md §3 EP2): pivot and the
  * subquery family. Subqueries exercise Catalyst's decorrelation
  * rewrites (`RewriteCorrelatedScalarSubquery`, semi/anti conversion
  * of EXISTS/IN) — the same physical plans as the DF-API joins, which
  * is exactly the point: EP1 and EP2 converge on one IR.
  *
  * Determinism: counts are integers; the one scalar threshold is an
  * exact decimal sum divided once (both engines produce the identical
  * double, so the comparison filters identical rows).
  *
  * Scale: pivot is a single two-phase aggregate over a FIXED value
  * list (never an implicit distinct-scan of the pivot column at
  * planning time); correlated counts decorrelate to one shuffled
  * aggregate + join, not per-row subquery execution.
  */
object SqlQueries extends QueryPack {

  def queries: Seq[(String, Q)] = Seq(
    // Pivot events into per-user counts per event_type, value list
    // pinned (5 types) so the plan needs no pre-scan.
    "agg_pivot" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select($"user_id",
          coalesce($"click", lit(0L)).as("click"),
          coalesce($"error", lit(0L)).as("error"),
          coalesce($"purchase", lit(0L)).as("purchase"),
          coalesce($"signup", lit(0L)).as("signup"),
          coalesce($"view", lit(0L)).as("view"))
        .orderBy($"user_id")
    }),

    // Uncorrelated scalar subquery: orders above 1.5× the global
    // average order value (exact-decimal average → identical double).
    "sub_scalar" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("sq_orders")
      s.sql("""
        SELECT o_orderkey, o_totalprice FROM sq_orders
        WHERE o_totalprice > (
          SELECT 1.5 * (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                             AS DOUBLE) / count(*))
          FROM sq_orders)
        ORDER BY o_orderkey""")
    }),

    // Correlated scalar subquery: per-customer order count
    // (decorrelates to an aggregate + left outer join).
    "sub_correlated" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("sq_orders")
      Tables.load(s, dir, "customer").createOrReplaceTempView("sq_cust")
      s.sql("""
        SELECT c_custkey,
          (SELECT count(*) FROM sq_orders WHERE o_custkey = c_custkey)
            AS n_orders
        FROM sq_cust ORDER BY c_custkey""")
    }),

    // EXISTS + IN subqueries (plan: left-semi joins).
    "sub_exists_in" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("sq_orders")
      Tables.load(s, dir, "customer").createOrReplaceTempView("sq_cust")
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("sq_li")
      s.sql("""
        SELECT o_orderkey FROM sq_orders
        WHERE EXISTS (SELECT 1 FROM sq_li
                      WHERE l_orderkey = o_orderkey AND l_quantity > 49)
          AND o_custkey IN (SELECT c_custkey FROM sq_cust
                            WHERE c_mktsegment = 'BUILDING')
        ORDER BY o_orderkey""")
    }),

    // FILTER-clause aggregates (SQL:2003) + count_if: conditional
    // aggregation without self-joins or CASE pyramids. Plans as ONE
    // two-phase aggregate — each filtered agg is a conditional update
    // in the same hash map, so N filtered metrics still cost one scan
    // and one key-cardinality shuffle.
    "agg_filtered" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("sq_orders")
      s.sql("""
        SELECT o_orderpriority,
          count(*) AS n,
          count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
               FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f,
          count_if(o_totalprice > 200000) AS n_big
        FROM sq_orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    }),

    // EXISTS in the SELECT list (r7): a boolean flag per row, not a
    // filter — Catalyst plans this as an ExistenceJoin (a join type
    // none of the WHERE-clause forms produce: semi keeps, anti drops,
    // existence ANNOTATES). The 100-TB point: flagging rows costs one
    // semi-join-shaped pass, not a COUNT subquery per row.
    "sub_exists_select" -> ((s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("sq_cust")
      Tables.load(s, dir, "orders").createOrReplaceTempView("sq_orders")
      s.sql("""
        SELECT c_custkey,
          EXISTS(SELECT 1 FROM sq_orders
                 WHERE o_custkey = c_custkey
                   AND o_orderpriority = '1-URGENT') AS has_urgent
        FROM sq_cust ORDER BY c_custkey""")
    }),

    // Recursive CTE (Spark 4's WITH RECURSIVE): every customer climbs
    // the synthetic binary-tree hierarchy key -> key div 2 to the
    // root, enumerating its full ancestor chain — the org-chart /
    // BOM-explosion shape relational engines need recursion for.
    // Depth is logarithmic in the key space (~14 levels at sf0.1, far
    // under spark.sql.cteRecursionLevelLimit=100); each level is one
    // join-free projection + filter over the previous level, and the
    // output aggregate is exact integers. DuckDB runs the same
    // recursion (integer div spelled `//` there, `div` here).
    "sql_recursive" -> ((s, dir) => {
      // Total recursion output is n_customers × ~log2(max key) rows —
      // ~2M at sf0.1 (ScaleBench r8 measured the default 10^6
      // spark.sql.cteRecursionRowLimit guard tripping at 10×). The
      // limit is a runaway-recursion safety valve, not a memory bound
      // (each level is one narrow projection), so size it to the
      // workload's known log-depth output instead of the default.
      s.conf.set("spark.sql.cteRecursionRowLimit", "100000000")
      Tables.load(s, dir, "customer").createOrReplaceTempView("sq_cust")
      s.sql("""
        WITH RECURSIVE up AS (
          SELECT c_custkey AS start, c_custkey AS cur, 0 AS depth
          FROM sq_cust
          UNION ALL
          SELECT start, cur div 2, depth + 1 FROM up WHERE cur > 1)
        SELECT depth, count(*) AS n,
          CAST(sum(cur) AS BIGINT) AS sum_cur,
          min(start) AS min_start, max(start) AS max_start
        FROM up GROUP BY depth ORDER BY depth""")
    }))

  def oracle: Seq[(String, String)] = Seq(
    "agg_pivot" ->
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    :: BIGINT AS click,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    :: BIGINT AS error,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    :: BIGINT AS purchase,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    :: BIGINT AS signup,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    :: BIGINT AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "sub_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT 1.5 * (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |                     AS DOUBLE) / count(*))
        |  FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "sub_correlated" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)
        |    AS n_orders
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "sub_exists_in" ->
      """SELECT o_orderkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |  AND o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,

    // count_if mirrored as a FILTER count (same semantics; DuckDB
    // spells the SQL:2003 form only).
    "agg_filtered" ->
      """SELECT o_orderpriority,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_f,
        |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "sub_exists_select" ->
      """SELECT c_custkey,
        |  EXISTS(SELECT 1 FROM orders
        |         WHERE o_custkey = c_custkey
        |           AND o_orderpriority = '1-URGENT') AS has_urgent
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "sql_recursive" ->
      """WITH RECURSIVE up AS (
        |  SELECT c_custkey AS start, c_custkey AS cur, 0 AS depth
        |  FROM customer
        |  UNION ALL
        |  SELECT start, cur // 2, depth + 1 FROM up WHERE cur > 1)
        |SELECT depth, count(*) AS n,
        |  CAST(sum(cur) AS BIGINT) AS sum_cur,
        |  min(start) AS min_start, max(start) AS max_start
        |FROM up GROUP BY depth ORDER BY depth""".stripMargin)
}
