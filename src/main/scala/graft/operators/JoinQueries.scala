package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2.C — join operators (SURVEY.md §2.C).
  *
  * Scale notes:
  *  - Dimension tables (region/nation/part/supplier) are explicitly
  *    `broadcast()` so the fact side never shuffles for them.
  *  - Fact⋈fact joins (lineitem⋈orders) shuffle on the join key and
  *    rely on AQE for runtime coalescing / skew splitting.
  *  - The theta/as-of joins always carry an equi key (user_id) so they
  *    plan as hash/sort-merge joins with a range residual — never a
  *    nested-loop over the full input. The as-of lookback is bounded
  *    (1 day) so per-key state stays O(events/day), not O(history).
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
    "join_multiway" -> (joinMultiway _),

    // Broadcast hash equi-join: fact ⋈ small dim.
    "join_broadcast" -> ((s, dir) => {
      import s.implicits._
      val l = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      l.join(broadcast(p), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(dsum($"l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy($"p_brand")
    }),

    // Shuffle sort-merge equi-join (merge hint pins the plan).
    "join_shuffle" -> ((s, dir) => {
      import s.implicits._
      val l = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      l.hint("merge").join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(dsum($"l_extendedprice").as("sum_price"),
             count(lit(1)).as("n"))
        .orderBy($"o_orderstatus")
    }),

    // Left outer join: customers with and without orders.
    "join_left_outer" -> ((s, dir) => {
      import s.implicits._
      val c = Tables.load(s, dir, "customer")
      // Pre-aggregate orders per custkey BEFORE the outer join: the
      // join then shuffles one row per customer instead of one per
      // order — the aggregate-below-join rewrite that matters at 100×
      // order volume. Null-preserving semantics are identical.
      val perCust = Tables.load(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("o_n"),
             sum(money($"o_totalprice")).as("o_spend"))
      c.join(perCust, $"c_custkey" === $"o_custkey", "left")
        .select($"c_custkey",
          coalesce($"o_n", lit(0L)).as("n_orders"),
          coalesce($"o_spend", lit(0)).cast(DoubleType).as("spend"))
        .orderBy($"c_custkey")
    }),

    // Full outer join on per-nation aggregates of two tables.
    "join_full_outer" -> ((s, dir) => {
      import s.implicits._
      val su = Tables.load(s, dir, "supplier")
        .groupBy($"s_nationkey".as("nk_s")).agg(count(lit(1)).as("n_supp"))
      val cu = Tables.load(s, dir, "customer")
        .groupBy($"c_nationkey".as("nk_c")).agg(count(lit(1)).as("n_cust"))
      su.join(cu, $"nk_s" === $"nk_c", "full_outer")
        .select(coalesce($"nk_s", $"nk_c").as("nationkey"),
                coalesce($"n_supp", lit(0)).as("n_supp"),
                coalesce($"n_cust", lit(0)).as("n_cust"))
        .orderBy($"nationkey")
    }),

    // Left semi (EXISTS): parts that appear in any lineitem.
    "join_semi" -> ((s, dir) => {
      import s.implicits._
      val p = Tables.load(s, dir, "part")
      val l = Tables.load(s, dir, "lineitem")
      p.join(l, $"p_partkey" === $"l_partkey", "left_semi")
        .select($"p_partkey", $"p_name")
        .orderBy($"p_partkey")
    }),

    // Left anti (NOT EXISTS): customers with no URGENT orders.
    "join_anti" -> ((s, dir) => {
      import s.implicits._
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
      c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }),

    // Cross join over the two tiny dims (BroadcastNestedLoopJoin).
    "join_cross" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "region")
        .crossJoin(Tables.load(s, dir, "nation"))
        .select($"r_name", $"n_name")
        .orderBy($"r_name", $"n_name")
    }),

    // Null-safe equi-join (<=>): NULL keys match each other instead of
    // dropping out — the join form ingest pipelines need for nullable
    // dimension keys. Stays a hash join (null-safe equality is still
    // an equi-key). Nulls synthesized via nullif (fixtures have none).
    "join_null_safe" -> ((s, dir) => {
      import s.implicits._
      val a = Tables.load(s, dir, "nation")
        .select($"n_nationkey", $"n_name",
                nullif($"n_regionkey", lit(2)).as("rk"))
      val b = Tables.load(s, dir, "region")
        .select(nullif($"r_regionkey", lit(2)).as("rk"), $"r_name")
      a.join(broadcast(b), a("rk") <=> b("rk"))
        .select($"n_nationkey", $"n_name", $"r_name")
        .orderBy($"n_nationkey")
    }),

    // Theta/range join: same-user event pairs within one hour.
    // Time-bucketed equi-join: the range condition is covered by
    // joining on (user, hour-bucket), with the left side exploded into
    // its own bucket and the next one — every qualifying pair lands in
    // exactly one bucket pair, so output has no duplicates. The join
    // key (user, bucket) bounds per-key fanout to one hour of one
    // user's events, where a bare user_id key would go quadratic in a
    // user's full history at 100 TB. Residual filter applies the exact
    // (a < b <= a+1h) bounds. ts truncated to seconds on both engines
    // (SURVEY.md §7.4 P3).
    "join_theta_range" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id",
                unix_timestamp(date_trunc("second", $"ts")).as("sec"))
      val b = e.select($"event_id".as("b_id"), $"user_id".as("b_user"),
                       $"sec".as("b_sec"),
                       floor($"sec" / 3600L).as("b_bkt"))
      val a = e.select($"event_id".as("a_id"), $"user_id".as("a_user"),
                       $"sec".as("a_sec"))
        .withColumn("a_bkt", explode(array(
          floor($"a_sec" / 3600L), floor($"a_sec" / 3600L) + 1L)))
      a.join(b, $"a_user" === $"b_user" && $"a_bkt" === $"b_bkt" &&
                $"a_sec" < $"b_sec" && $"b_sec" <= $"a_sec" + 3600L)
        .select($"a_id", $"b_id")
        .orderBy($"a_id", $"b_id")
    }),

    // As-of join: for each purchase, the latest click of the same user
    // at-or-before it, looking back at most 1 day (bounded state at
    // scale). Spark has no native as-of; range join + window row_number
    // is the idiomatic mapping.
    "join_asof" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"),
                date_trunc("second", $"ts").as("p_ts"))
      val clicks = e.filter($"event_type" === "click")
        .select($"event_id".as("c_id"), $"user_id".as("c_user"),
                date_trunc("second", $"ts").as("c_ts"), $"value".as("c_value"))
      val w = Window.partitionBy($"p_id")
        .orderBy($"c_ts".desc, $"c_id".desc)
      purchases
        .join(clicks, $"p_user" === $"c_user" && $"c_ts" <= $"p_ts" &&
                      $"c_ts" > $"p_ts" - expr("INTERVAL 1 DAY"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"p_id", $"c_id", $"c_value")
        .orderBy($"p_id")
    }),

    // NEAREST-tolerance as-of (r7): pandas merge_asof
    // direction='nearest' — each purchase takes the click closest in
    // time within ±30 min, looking BOTH ways (the backward-only form
    // above misses a click 1 s after the purchase in favor of one
    // 29 min before). Candidates come from the same hour-bucket
    // explode as join_theta_range (bounded per-key fanout); winner =
    // min |Δt|, ties broken toward the EARLIER click then c_id. The
    // |Δt| compare is integer seconds — exact.
    "join_asof_nearest" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type",
          unix_timestamp(date_trunc("second", $"ts")).as("sec"))
      val p = e.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"),
          $"sec".as("p_sec"))
        .withColumn("bkt", explode(array(
          expr("p_sec div 1800 - 1"), expr("p_sec div 1800"),
          expr("p_sec div 1800 + 1"))))
      val c = e.filter($"event_type" === "click")
        .select($"event_id".as("c_id"), $"user_id".as("c_user"),
          $"sec".as("c_sec"), expr("sec div 1800").as("bkt"))
      p.join(c, $"p_user" === $"c_user" && p("bkt") === c("bkt") &&
          abs($"c_sec" - $"p_sec") <= 1800)
        .withColumn("rn", row_number().over(
          Window.partitionBy($"p_id")
            .orderBy(abs($"c_sec" - $"p_sec"), $"c_sec", $"c_id")))
        .filter($"rn" === 1)
        .select($"p_id", $"c_id", ($"c_sec" - $"p_sec").as("dt_s"))
        .orderBy($"p_id")
    }),

    // The same as-of semantics through the NATIVE operator
    // (plans/AsOfJoin.scala: LogicalPlan + Strategy + SparkPlan): one
    // O(n+m) merge per key group instead of fanning each purchase out
    // to a day of clicks before keeping one. Same oracle as join_asof.
    "join_asof_native" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"),
                date_trunc("second", $"ts").as("p_ts"))
      val clicks = e.filter($"event_type" === "click")
        .select($"event_id".as("c_id"), $"user_id".as("c_user"),
                date_trunc("second", $"ts").as("c_ts"),
                $"value".as("c_value"))
      graft.plans.AsOfJoin.asof(purchases, clicks,
          key = ("p_user", "c_user"), ts = ("p_ts", "c_ts"),
          rightTies = Seq("c_id"), toleranceMicros = 86400L * 1000000)
        .select($"p_id", $"c_id", $"c_value")
        .orderBy($"p_id")
    }),

    // Salted shuffle join as a first-class oracled operator (the
    // SkewJoinSpec technique, productized): fact rows carry a
    // deterministic salt in 0..7, the dim side is exploded 8 ways, and
    // the join keys on (suppkey, salt) — a skewed suppkey's rows land
    // in 8 distinct shuffle partitions instead of one straggler task.
    // The merge hint pins SMJ (broadcast would hide the technique);
    // the salt aggregates out, so the result is provably identical to
    // the plain join — which is exactly what the oracle runs.
    "join_skew_salted" -> ((s, dir) => {
      import s.implicits._
      val buckets = 8
      val fact = Tables.load(s, dir, "lineitem")
        .withColumn("fsalt", pmod($"l_orderkey", lit(buckets)).cast(IntegerType))
      val dim = Tables.load(s, dir, "supplier")
        .withColumn("dsalt", explode(array((0 until buckets).map(lit): _*)))
      fact.hint("merge")
        .join(dim, $"l_suppkey" === $"s_suppkey" && $"fsalt" === $"dsalt")
        .groupBy($"s_nationkey")
        .agg(dsum($"l_extendedprice").as("sum_price"),
             count(lit(1)).as("n"))
        .orderBy($"s_nationkey")
    }),

    // Interval-OVERLAP join (r7): purchases and clicks each carry a
    // VARIABLE-length activity interval [s, e) (length = value x 10
    // in seconds, up to ~3 h), and the query finds same-user pairs
    // whose intervals overlap — the general interval join that as-of
    // (point-to-latest-point) and theta-range (point-in-fixed-window)
    // cannot express, because both endpoints vary per row. The
    // distributed plan is the canonical bucketed interval join: each
    // interval explodes to the 10-minute buckets it touches (≤ 3 here
    // — fanout is ceil(len/W)+1, bounded by the interval cap), pairs
    // equi-join on (user, bucket), a residual predicate checks real
    // overlap, and each pair is COUNTED EXACTLY ONCE without any
    // distinct: only the bucket containing max(s_a, s_b) — the
    // overlap's start — reports it. No quadratic stage: per-(user,
    // bucket) occupancy bounds all pair work.
    "join_interval_overlap" -> ((s, dir) => {
      import s.implicits._
      val W = 600L
      def side(tpe: String, idc: String) =
        Tables.load(s, dir, "events")
          .filter($"event_type" === tpe)
          .selectExpr(s"event_id AS $idc", "user_id",
            "unix_timestamp(date_trunc('SECOND', ts)) AS s",
            // nonNeg guard (r8, advisor item 3): the interval length
            // uses Spark `div` (truncates) while the oracle uses
            // DuckDB `//` (floors) — equal only for cents >= 0. The
            // fixture holds value >= 0; a future negative would
            // otherwise surface as a silent cross-engine divergence.
            "unix_timestamp(date_trunc('SECOND', ts)) + " +
              graft.Det.nonNegExpr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)",
                "join_interval_overlap cents") +
              " div 10 AS e")
          .filter($"e" > $"s")
      val p = side("purchase", "p_id")
        .withColumn("bkt", explode(expr(s"sequence(s div $W, (e - 1) div $W)")))
      val c = side("click", "c_id")
        .withColumn("bkt", explode(expr(s"sequence(s div $W, (e - 1) div $W)")))
        .withColumnRenamed("s", "cs").withColumnRenamed("e", "ce")
      p.join(c, Seq("user_id", "bkt"))
        .filter($"s" < $"ce" && $"cs" < $"e")
        .filter(expr(s"bkt = greatest(s, cs) div $W"))
        .select($"p_id", $"c_id", $"user_id",
          (least($"e", $"ce") - greatest($"s", $"cs")).as("overlap_s"))
        .orderBy($"p_id", $"c_id")
    }),

    // Grid-bucketed RADIUS join (r11d) — the canonical spatial-join
    // shape (geo points, UI coordinates, 2D feature slices): pairs
    // within L2 distance r, found via a uniform grid of cell size r.
    // One side explodes to its 3×3 cell neighborhood, the other keys
    // by its own cell, so the join is a bucketed EQUI-join (never
    // all-pairs) and PROVABLY complete: two points within r differ by
    // < r per axis, so their cells differ by ≤ 1 — the candidate
    // bucket always exists (completeness asserted vs brute force in
    // R11dOpsSpec). The exact (dx² + dy² ≤ r²) gate is one fixed IEEE
    // expression, byte-identical in the oracle; cell ids are integer
    // floor(x/r) folds. Cost: 9 candidate rows per point into a
    // cell-keyed shuffle — linear in points × local density, the
    // interval-overlap bucketing argument in 2D. Skewed hot cells
    // (urban clusters at geo scale) take the same salting/cap
    // treatment as every bucketed join here.
    "join_spatial_grid" -> ((s, dir) => {
      import s.implicits._
      val pts = Tables.load(s, dir, "embeddings")
        .select($"vec_id",
          $"embedding".getItem(0).cast("double").as("x"),
          $"embedding".getItem(1).cast("double").as("y"))
        .withColumn("cx", floor($"x" / 0.05).cast("long"))
        .withColumn("cy", floor($"y" / 0.05).cast("long"))
      val b = pts.select($"vec_id".as("db"), $"x".as("bx"),
        $"y".as("by"), ($"cx" * 100000L + $"cy").as("cell"))
      val a = pts.select($"vec_id".as("da"), $"x".as("ax"),
          $"y".as("ay"), $"cx", $"cy")
        .withColumn("cell", explode(expr(
          "transform(sequence(0, 8), " +
            "i -> (cx + i div 3 - 1) * 100000 + (cy + i % 3 - 1))")))
      a.join(b, Seq("cell"))
        .filter($"da" < $"db")
        .filter(($"ax" - $"bx") * ($"ax" - $"bx") +
          ($"ay" - $"by") * ($"ay" - $"by") <= 0.0025)
        .select($"da", $"db",
          round(sqrt(($"ax" - $"bx") * ($"ax" - $"bx") +
            ($"ay" - $"by") * ($"ay" - $"by")), 6).as("dist_r"))
        .orderBy($"da", $"db")
    }),

    // Bloom-style semi-join reduction (r11c): the runtime-filter
    // pattern behind every big fact⋈selective-dim join at 100 TB —
    // shuffling the whole fact table to discover that most rows have
    // no partner is the single largest avoidable cost in the plan.
    // Phase 1 compresses the dim side's join keys to a tiny
    // hash-bucket membership set (k=1 Bloom filter: ≤ 8192 distinct
    // bucket values ≈ 8 KB of set bits, regardless of dim row count)
    // and broadcast-SEMI-joins the fact against it — a map-side
    // filter that never shuffles the fact and admits only true
    // matches plus bounded hash collisions. Phase 2 runs the exact
    // join on the survivors, which removes the false positives, so
    // the reduction is invisible in the answer: the oracle is the
    // PLAIN join (same proof discipline as join_skew_salted). Spark's
    // own AQE runtime filters inject the same shape automatically
    // when statistics justify it; this key pins the explicit form so
    // the plan (broadcast bucket set + post-filter join) is a tested
    // artifact rather than an optimizer hope.
    "join_bloom" -> ((s, dir) => {
      import s.implicits._
      val dim = Tables.load(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey")
      val buckets = dim
        .select(pmod($"c_custkey", lit(8192L)).as("kb")).distinct()
      val fact = Tables.load(s, dir, "orders")
      val pre = fact.join(broadcast(buckets),
        pmod(fact("o_custkey"), lit(8192L)) === col("kb"), "left_semi")
      pre.join(dim, pre("o_custkey") === dim("c_custkey"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          dsum($"o_totalprice").as("sum_price"))
        .orderBy($"o_orderpriority")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    // The oracle joins intervals directly (no buckets): the bucketed
    // plan must produce the identical pair set, proving the
    // explode/residual/report-once machinery loses and duplicates
    // nothing.
    "join_interval_overlap" ->
      """WITH p AS (SELECT event_id AS p_id, user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS s,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |      + CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 10
        |      AS e
        |  FROM events WHERE event_type = 'purchase'),
        |p2 AS (SELECT * FROM p WHERE e > s),
        |c AS (SELECT event_id AS c_id, user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS cs,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |      + CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) // 10
        |      AS ce
        |  FROM events WHERE event_type = 'click'),
        |c2 AS (SELECT * FROM c WHERE ce > cs)
        |SELECT p2.p_id, c2.c_id, p2.user_id,
        |  least(p2.e, c2.ce) - greatest(p2.s, c2.cs) AS overlap_s
        |FROM p2 JOIN c2 ON p2.user_id = c2.user_id
        |  AND p2.s < c2.ce AND c2.cs < p2.e
        |ORDER BY p_id, c_id""".stripMargin,

    "join_asof_nearest" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events),
        |p AS (SELECT event_id AS p_id, user_id, sec AS p_sec FROM e
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id, sec AS c_sec FROM e
        |  WHERE event_type = 'click'),
        |j AS (SELECT p.p_id, c.c_id, c.c_sec - p.p_sec AS dt,
        |    row_number() OVER (PARTITION BY p.p_id
        |      ORDER BY abs(c.c_sec - p.p_sec), c.c_sec, c.c_id) AS rn
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND abs(c.c_sec - p.p_sec) <= 1800)
        |SELECT p_id, c_id, dt AS dt_s FROM j WHERE rn = 1
        |ORDER BY p_id""".stripMargin,

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
        |ORDER BY r_name, n_name""".stripMargin,

    "join_broadcast" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "join_shuffle" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "join_left_outer" ->
      """SELECT c_custkey,
        |  COUNT(o_orderkey) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "join_full_outer" ->
      """SELECT COALESCE(nk_s, nk_c) AS nationkey,
        |       COALESCE(n_supp, 0) AS n_supp,
        |       COALESCE(n_cust, 0) AS n_cust
        |FROM (SELECT s_nationkey AS nk_s, COUNT(*) AS n_supp
        |      FROM supplier GROUP BY s_nationkey) su
        |FULL OUTER JOIN
        |     (SELECT c_nationkey AS nk_c, COUNT(*) AS n_cust
        |      FROM customer GROUP BY c_nationkey) cu
        |ON nk_s = nk_c
        |ORDER BY nationkey""".stripMargin,

    "join_semi" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
        |ORDER BY p_partkey""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "join_null_safe" ->
      """SELECT n_nationkey, n_name, r_name
        |FROM (SELECT n_nationkey, n_name,
        |        nullif(n_regionkey, 2) AS rk FROM nation) a
        |JOIN (SELECT nullif(r_regionkey, 2) AS rk, r_name
        |      FROM region) b
        |  ON a.rk IS NOT DISTINCT FROM b.rk
        |ORDER BY n_nationkey""".stripMargin,

    "join_theta_range" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND date_trunc('second', a.ts) < date_trunc('second', b.ts)
        | AND date_trunc('second', b.ts) <= date_trunc('second', a.ts) + INTERVAL 1 HOUR
        |ORDER BY a_id, b_id""".stripMargin,

    "join_asof" ->
      """SELECT p_id, c_id, c_value FROM (
        |  SELECT p.event_id AS p_id, c.event_id AS c_id, c.value AS c_value,
        |         ROW_NUMBER() OVER (PARTITION BY p.event_id
        |           ORDER BY date_trunc('second', c.ts) DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id
        |   AND date_trunc('second', c.ts) <= date_trunc('second', p.ts)
        |   AND date_trunc('second', c.ts) >  date_trunc('second', p.ts) - INTERVAL 1 DAY
        |) t WHERE rn = 1
        |ORDER BY p_id""".stripMargin,

    "join_asof_native" ->
      """SELECT p_id, c_id, c_value FROM (
        |  SELECT p.event_id AS p_id, c.event_id AS c_id, c.value AS c_value,
        |         ROW_NUMBER() OVER (PARTITION BY p.event_id
        |           ORDER BY date_trunc('second', c.ts) DESC, c.event_id DESC) AS rn
        |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |    ON p.user_id = c.user_id
        |   AND date_trunc('second', c.ts) <= date_trunc('second', p.ts)
        |   AND date_trunc('second', c.ts) >  date_trunc('second', p.ts) - INTERVAL 1 DAY
        |) t WHERE rn = 1
        |ORDER BY p_id""".stripMargin,

    // The bucket prefilter is pure execution strategy — the oracle is
    // the PLAIN join, proving the reduction changes the plan, not the
    // answer (false positives die in the exact join).
    "join_spatial_grid" ->
      """WITH pts AS (SELECT vec_id,
        |    CAST(embedding[1] AS DOUBLE) AS x,
        |    CAST(embedding[2] AS DOUBLE) AS y
        |  FROM embeddings),
        |cells AS (SELECT vec_id, x, y,
        |    CAST(floor(x / 0.05) AS BIGINT) AS cx,
        |    CAST(floor(y / 0.05) AS BIGINT) AS cy FROM pts),
        |b AS (SELECT vec_id AS db, x AS bx, y AS by,
        |    cx * 100000 + cy AS cell FROM cells),
        |a AS (SELECT vec_id AS da, x AS ax, y AS ay,
        |    (cx + i // 3 - 1) * 100000 + (cy + i % 3 - 1) AS cell
        |  FROM cells CROSS JOIN generate_series(0, 8) AS g(i))
        |SELECT da, db,
        |  round(sqrt((ax - bx) * (ax - bx) + (ay - by) * (ay - by)), 6)
        |    AS dist_r
        |FROM a JOIN b USING (cell)
        |WHERE da < db
        |  AND (ax - bx) * (ax - bx) + (ay - by) * (ay - by) <= 0.0025
        |ORDER BY da, db""".stripMargin,

    "join_bloom" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // The salt is pure execution strategy — the oracle is the PLAIN
    // join, proving the rewrite changes the plan, not the answer.
    "join_skew_salted" ->
      """SELECT s_nationkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin
  )
}
