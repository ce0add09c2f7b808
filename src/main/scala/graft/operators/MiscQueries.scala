package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-out operators: binary encodings, bitwise aggregates, LATERAL
  * correlated subqueries, and single-scan column profiling (the
  * data-quality step every training-data ingest runs first).
  *
  * Determinism: encodings are byte-exact (hex normalized to lower
  * case — Spark upper-cases hex digits, DuckDB lower-cases); bitwise
  * aggs are order-free integer folds; the profiler emits exact counts
  * and DECIMAL-cast extrema.
  */
object MiscQueries extends QueryPack {

  def queries: Seq[(String, Q)] = Seq(
    // base64 / hex / round-trip decode over text payload prefixes.
    "fn_encode" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          base64(substring($"text", 1, 12).cast(BinaryType)).as("b64"),
          lower(hex(substring($"text", 1, 6).cast(BinaryType))).as("hx"),
          (expr("decode(unbase64(base64(cast(substring(text, 1, 12) AS BINARY))), 'UTF-8')")
            === substring($"text", 1, 12)).as("roundtrip_ok"),
          octet_length(expr("unbase64(base64(cast(text AS BINARY)))"))
            .cast(LongType).as("n_bytes"))
        .orderBy($"doc_id")
    }),

    // Bitwise AND/OR/XOR aggregates per language over doc ids.
    "agg_bitwise" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .groupBy($"lang")
        .agg(count(lit(1)).as("n"),
          bit_and($"doc_id").as("band"),
          bit_or($"doc_id").as("bor"),
          bit_xor($"doc_id").as("bxor"))
        .orderBy($"lang")
    }),

    // LATERAL correlated derived table (Spark 3.2+/DuckDB): per
    // customer, an aggregate computed by a lateral subquery. Plans as
    // a decorrelated aggregate + outer join, same as sub_correlated.
    "sub_lateral" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("sq_orders")
      Tables.load(s, dir, "customer").createOrReplaceTempView("sq_cust")
      s.sql("""
        SELECT c_custkey, t.n, t.max_price
        FROM sq_cust,
        LATERAL (
          SELECT count(*) AS n,
            CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
              AS max_price
          FROM sq_orders WHERE o_custkey = c_custkey) t
        ORDER BY c_custkey""")
    }),

    // Column profiling in ONE scan, exact form: melt the profiled
    // columns map-side (array-of-struct explode — no shuffle), then a
    // two-phase aggregate on (col, value) whose partial side collapses
    // each partition to its distinct values — the shuffle carries only
    // distinct (col, value) pairs with counts, never raw rows (the
    // multi-distinct Expand plan shuffles the same pairs but plans a
    // 3× Expand first; this melt is one narrow projection). The tiny
    // per-value relation then folds to one row per column.
    // At 100 TB the default profiler should be the sketch variant
    // (Profiler.profile / `profile_sketch`): exact n_distinct shuffles
    // every distinct value, a profiler rarely needs that.
    "profile_table" -> ((s, dir) =>
      Profiler.profile(Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        exact = true)),

    // Sketch profiler: HLL++ n_distinct (rsd 2%) — the 100-TB default.
    // No cross-engine oracle (approx result); ProfilerSpec asserts its
    // exact fields (n, n_nonnull, extrema) bit-equal to the exact
    // profiler and n_distinct within 3·rsd of exact at sf0.001+sf0.01.
    "profile_sketch" -> ((s, dir) =>
      Profiler.profile(Tables.load(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        exact = false)))

  def oracle: Seq[(String, String)] = Seq(
    "fn_encode" ->
      """SELECT doc_id,
        |  to_base64(encode(substring(text, 1, 12))) AS b64,
        |  lower(hex(encode(substring(text, 1, 6)))) AS hx,
        |  decode(from_base64(to_base64(encode(substring(text, 1, 12)))))
        |    = substring(text, 1, 12) AS roundtrip_ok,
        |  CAST(octet_length(from_base64(to_base64(encode(text))))
        |    AS BIGINT) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "agg_bitwise" ->
      """SELECT lang, count(*) AS n,
        |  bit_and(doc_id) AS band, bit_or(doc_id) AS bor,
        |  bit_xor(doc_id) AS bxor
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "sub_lateral" ->
      """SELECT c_custkey, t.n, t.max_price
        |FROM customer,
        |LATERAL (
        |  SELECT count(*) AS n,
        |    CAST(max(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS max_price
        |  FROM orders WHERE o_custkey = c_custkey) t
        |ORDER BY c_custkey""".stripMargin,

    "profile_table" ->
      """WITH a AS (SELECT
        |  count(*) AS n,
        |  count(l_quantity) AS nn_q, count(DISTINCT l_quantity) AS nd_q,
        |  CAST(min(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS min_q,
        |  CAST(max(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_q,
        |  count(l_extendedprice) AS nn_p,
        |  count(DISTINCT l_extendedprice) AS nd_p,
        |  CAST(min(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS min_p,
        |  CAST(max(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS max_p,
        |  count(l_discount) AS nn_d, count(DISTINCT l_discount) AS nd_d,
        |  CAST(min(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS min_d,
        |  CAST(max(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS max_d
        |  FROM lineitem)
        |SELECT n, 'l_quantity' AS col, nn_q AS n_nonnull, nd_q AS n_distinct,
        |  min_q AS min_v, max_q AS max_v FROM a
        |UNION ALL
        |SELECT n, 'l_extendedprice', nn_p, nd_p, min_p, max_p FROM a
        |UNION ALL
        |SELECT n, 'l_discount', nn_d, nd_d, min_d, max_d FROM a
        |ORDER BY col""".stripMargin)
}
