package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2.F — sort / limit / top-k / set ops / dedup (SURVEY.md §2.F).
  *
  * Scale notes: global sorts use Spark's range-partitioned SortExec
  * (sampled boundaries, no single-node sort); orderBy+limit plans as
  * TakeOrderedAndProject (per-partition top-k, tiny shuffle — no full
  * sort at 100 TB). dedup keeps the deterministic window-row_number
  * form, which shuffles once on the dedup key.
  */
object SortSetQueries extends QueryPack {
  import Det._

  def queries: Seq[(String, Q)] = Seq(
    // Multi-key global sort (asc, desc, asc) → range exchange + sort.
    "sort_multi" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        .orderBy($"o_orderpriority".asc, $"o_totalprice".desc,
                 $"o_orderkey".asc)
    }),

    // Global top-K — plans as TakeOrderedAndProject, not a full sort.
    "sort_limit_topk" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey".asc,
                 $"l_linenumber".asc)
        .limit(25)
    }),

    // UNION ALL reconstitution + unionByName with reordered columns.
    "set_union_all" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val mid = lit("2024-01-16").cast(TimestampType)
      val h1 = e.filter($"ts" < mid).select($"event_id", $"event_type")
      val h2 = e.filter($"ts" >= mid).select($"event_type", $"event_id")
      h1.unionByName(h2).orderBy($"event_id")
    }),

    // INTERSECT (distinct).
    "set_intersect" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        .intersect(
          Tables.load(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
        .orderBy($"nationkey")
    }),

    // EXCEPT (distinct): nations with customers but no rich suppliers.
    "set_except" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        .except(
          Tables.load(s, dir, "supplier").filter($"s_acctbal" > 8000)
            .select($"s_nationkey".as("nationkey")))
        .orderBy($"nationkey")
    }),

    // EXCEPT ALL (multiset): orderkeys with >1 lineitem keep n-1 copies.
    "set_except_all" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem").select($"l_orderkey".as("okey"))
        .exceptAll(
          Tables.load(s, dir, "orders").select($"o_orderkey".as("okey")))
        .orderBy($"okey")
    }),

    // INTERSECT ALL (r7): multiset intersection — each orderkey
    // survives min(count_lineitem, count_orders) times, the semantics
    // EXCEPT ALL's sibling needs when reconciling multiplicity between
    // a fact table and its parent. Plans as one hash aggregate pair
    // over (value, side counts), no join.
    "set_intersect_all" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem").select($"l_orderkey".as("okey"))
        .intersectAll(
          Tables.load(s, dir, "orders").select($"o_orderkey".as("okey")))
        .orderBy($"okey")
    }),

    // Exact dedup, deterministic: keep lowest doc_id per text
    // (dropDuplicates is tie-nondeterministic; window form is not).
    "dedup_exact" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"text").orderBy($"doc_id")
      Tables.load(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    }),

    // Z-order clustering key (r6): interleave the bits of two join/
    // filter dimensions into one sort key so range-partitioning on it
    // co-locates rows that are close in BOTH dimensions — the standard
    // multi-dimensional layout trick for parquet min/max row-group
    // skipping (a query filtering either partkey OR suppkey prunes
    // files, because every z-range holds a tight bounding box of
    // both). The demo buckets the curve and reports each bucket's
    // bounding box: max spans stay narrow relative to the full domain,
    // which IS the file-skipping property. Pure integer bit arithmetic
    // (shift/and/or folds) — bit-identical in any engine; the z-fold
    // is map-side, the only shuffle is the bucket aggregate.
    "sort_zorder" -> ((s, dir) => {
      import s.implicits._
      // Native codegen interleave (ZInterleave.scala) — value-identical
      // to the former aggregate(sequence(0,15),…) HOF, minus its
      // per-row 16-element array + lambda closures.
      graft.functions.ZInterleave.register(s)
      Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_partkey", $"l_suppkey")
        .withColumn("z", expr("zinterleave(l_partkey, l_suppkey, 16)"))
        .withColumn("zbucket", expr("z div 65536"))
        .groupBy($"zbucket")
        .agg(count(lit(1)).as("n"),
          min($"l_partkey").as("pk_min"), max($"l_partkey").as("pk_max"),
          min($"l_suppkey").as("sk_min"), max($"l_suppkey").as("sk_max"))
        .withColumn("pk_span", $"pk_max" - $"pk_min")
        .withColumn("sk_span", $"sk_max" - $"sk_min")
        .orderBy($"zbucket")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    "sort_multi" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,

    "sort_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 25""".stripMargin,

    "set_union_all" ->
      """SELECT * FROM (
        |  SELECT event_id, event_type FROM events WHERE ts < TIMESTAMP '2024-01-16'
        |  UNION ALL
        |  SELECT event_id, event_type FROM events WHERE ts >= TIMESTAMP '2024-01-16'
        |) ORDER BY event_id""".stripMargin,

    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
        |ORDER BY nationkey""".stripMargin,

    "set_except_all" ->
      """SELECT l_orderkey AS okey FROM lineitem
        |EXCEPT ALL
        |SELECT o_orderkey FROM orders
        |ORDER BY okey""".stripMargin,

    "set_intersect_all" ->
      """SELECT l_orderkey AS okey FROM lineitem
        |INTERSECT ALL
        |SELECT o_orderkey FROM orders
        |ORDER BY okey""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // Per-bit contributions hit disjoint bit positions, so list_sum
    // (HUGEINT, cast back) equals the OR-fold.
    "sort_zorder" ->
      """WITH z AS (SELECT l_orderkey, l_partkey, l_suppkey,
        |    CAST(list_sum(list_transform(generate_series(0, 15), i ->
        |      (((l_partkey >> i) & 1) << (2 * i))
        |      + (((l_suppkey >> i) & 1) << (2 * i + 1)))) AS BIGINT)
        |      AS zv
        |  FROM lineitem)
        |SELECT zv // 65536 AS zbucket, count(*) AS n,
        |  min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
        |  min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max,
        |  max(l_partkey) - min(l_partkey) AS pk_span,
        |  max(l_suppkey) - min(l_suppkey) AS sk_span
        |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin
  )
}
