package graft.operators

import graft.{Det, QueryPack, Tables}
import graft.functions.WeightedMeanAgg
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2.D — aggregation operators (SURVEY.md §2.D).
  *
  * Scale notes: every groupBy here plans as two-phase HashAggregate
  * (map-side partial combine, then final after a shuffle on the group
  * keys), so shuffle volume is bounded by key cardinality, not input
  * size. Statistical moments are computed from exact decimal power
  * sums — associative/commutative, so partial aggregation stays exact
  * at any partition count (required for the cross-engine hash-match).
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
    }),

    // Exact distinct aggregation (expand + two-phase under the hood).
    "agg_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("n_users"),
             count(lit(1)).as("n_events"))
        .orderBy($"event_type")
    }),

    // HLL++ sketch distinct — engine-specific, rows-only check
    // (approx result has no cross-engine oracle; SURVEY.md §2.D).
    "agg_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"),
             count(lit(1)).as("n_events"))
        .orderBy($"event_type")
    }),

    // Statistical aggregates from exact power sums: mean, var/stddev
    // (sample), corr — deterministic at any parallelism. Linear sums
    // are emitted as cent-scaled BIGINTs; PRODUCT sums as radix-10^9
    // (hi, lo) BIGINT pairs (`Det.hiLoSplit`, r11): the sf1-equivalent
    // staging proved cent-scaled second moments overflow int64 at ~6M
    // rows (syy 7.4e15 money units — the r10 loud guard fired exactly
    // as designed), and the split stays exact to ~9.2e23. Integers
    // hash exactly cross-engine; the derived doubles below start from
    // bit-identical inputs via the shared hi*1e5 + lo/1e4 expression.
    "agg_stats" -> ((s, dir) => {
      import s.implicits._
      val sxxD = Det.hiLoDouble("sxx")
      val syyD = Det.hiLoDouble("syy")
      val sxyD = Det.hiLoDouble("sxy")
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(money($"l_quantity")).as("dx"),
          sum(money($"l_quantity") * money($"l_quantity")).as("dxx"),
          sum(money($"l_extendedprice")).as("dy"),
          sum(money($"l_extendedprice") * money($"l_extendedprice"))
            .as("dyy"),
          sum(money($"l_quantity") * money($"l_extendedprice")).as("dxy"))
        .select(Seq($"l_returnflag", $"n",
          Det.centsLong($"dx", 100, "sx_c"),
          Det.centsLong($"dy", 100, "sy_c")) ++
          Det.hiLoSplit($"dxx", "sxx") ++
          Det.hiLoSplit($"dyy", "syy") ++
          Det.hiLoSplit($"dxy", "sxy"): _*)
        .select($"l_returnflag", $"n",
          $"sx_c", $"sy_c", $"sxx_hi", $"sxx_lo",
          $"syy_hi", $"syy_lo", $"sxy_hi", $"sxy_lo",
          ($"sx_c" / 100.0 / $"n").as("mean_qty"),
          round((sxxD -
              ($"sx_c" / 100.0) * ($"sx_c" / 100.0) / $"n") / ($"n" - 1),
            6).as("var_qty"),
          round(sqrt((sxxD -
              ($"sx_c" / 100.0) * ($"sx_c" / 100.0) / $"n") / ($"n" - 1)),
            6).as("std_qty"),
          round(($"n" * sxyD -
              ($"sx_c" / 100.0) * ($"sy_c" / 100.0)) /
            (sqrt($"n" * sxxD -
               ($"sx_c" / 100.0) * ($"sx_c" / 100.0)) *
             sqrt($"n" * syyD -
               ($"sy_c" / 100.0) * ($"sy_c" / 100.0))), 12)
            .as("corr_qty_price"))
        .orderBy($"l_returnflag")
    }),

    // Ordinary least squares per group (r7): regr_slope / intercept /
    // r² of extendedprice on quantity, from the SAME exact integer
    // power sums as agg_stats (cent-scaled linear sums, hi/lo-split
    // products since r11) — never from the engines' native
    // regr_* functions, whose internal accumulation order differs.
    // Every derived value is a fixed IEEE expression over bit-identical
    // BIGINTs (intercept phrased sum-only, not via the rounded slope),
    // so both engines emit identical doubles. Two-phase agg: the
    // shuffle carries 6 numbers per group regardless of input rows.
    "agg_regression" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(money($"l_quantity")).as("dx"),
          sum(money($"l_quantity") * money($"l_quantity")).as("dxx"),
          sum(money($"l_extendedprice")).as("dy"),
          sum(money($"l_extendedprice") * money($"l_extendedprice"))
            .as("dyy"),
          sum(money($"l_quantity") * money($"l_extendedprice")).as("dxy"))
        .select(Seq($"l_returnflag", $"n",
          Det.centsLong($"dx", 100, "sx_c"),
          Det.centsLong($"dy", 100, "sy_c")) ++
          Det.hiLoSplit($"dxx", "sxx") ++
          Det.hiLoSplit($"dyy", "syy") ++
          Det.hiLoSplit($"dxy", "sxy"): _*)
        .select($"l_returnflag", $"n",
          round(($"n" * Det.hiLoDouble("sxy") -
              ($"sx_c" / 100.0) * ($"sy_c" / 100.0)) /
            ($"n" * Det.hiLoDouble("sxx") -
              ($"sx_c" / 100.0) * ($"sx_c" / 100.0)), 12).as("slope"),
          round((($"sy_c" / 100.0) * Det.hiLoDouble("sxx") -
              ($"sx_c" / 100.0) * Det.hiLoDouble("sxy")) /
            ($"n" * Det.hiLoDouble("sxx") -
              ($"sx_c" / 100.0) * ($"sx_c" / 100.0)), 12).as("intercept"),
          round((($"n" * Det.hiLoDouble("sxy") -
              ($"sx_c" / 100.0) * ($"sy_c" / 100.0)) *
             ($"n" * Det.hiLoDouble("sxy") -
              ($"sx_c" / 100.0) * ($"sy_c" / 100.0))) /
            (($"n" * Det.hiLoDouble("sxx") -
              ($"sx_c" / 100.0) * ($"sx_c" / 100.0)) *
             ($"n" * Det.hiLoDouble("syy") -
              ($"sy_c" / 100.0) * ($"sy_c" / 100.0))), 12).as("r2"))
        .orderBy($"l_returnflag")
    }),

    // Sketch percentiles — the single-pass 100-TB default when exact
    // rank selection isn't required: one two-phase aggregate whose
    // shuffle carries a bounded KLL-style summary per group
    // (approx_percentile, rank error ≤ n/accuracy). No cross-engine
    // oracle (engine-specific sketch); ProfilerSpec asserts the rank
    // error of each reported value against the true order statistics.
    "agg_approx_percentile" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      o.join(broadcast(c), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment".as("seg"))
        .agg(count(lit(1)).as("n"),
          expr("approx_percentile(o_totalprice, array(0.5D, 0.9D), 10000)")
            .as("ap"))
        .select($"seg", $"n",
          $"ap".getItem(0).as("p50_approx"),
          $"ap".getItem(1).as("p90_approx"))
        .orderBy($"seg")
    }),

    // Discrete percentiles (median, p90), exact and interpolation-free.
    // Scale-safe distributed selection: c_mktsegment has only 5 values,
    // so a window partitioned by segment alone would funnel the whole
    // table through 5 sort tasks at 100 TB. Instead: (1) histogram per
    // (segment, price bucket) — a plain two-phase hash aggregate;
    // (2) cumulative counts over the tiny bucket table locate which
    // bucket holds each target rank; (3) only rows in those ~2 buckets
    // per segment are ranked, via a window partitioned by
    // (segment, bucket). The big table is never globally sorted.
    "agg_percentile" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val j = o.join(broadcast(c), $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment".as("seg"), $"o_totalprice".as("price"),
                $"o_orderkey")
        .withColumn("b", floor($"price" / 1000.0).cast(LongType))
      val bCounts = j.groupBy($"seg", $"b").agg(count(lit(1)).as("c"))
      val wb = Window.partitionBy($"seg").orderBy($"b")
      // Per-segment totals come from the SAME cumulative frame (max of
      // the running sum), so the bucket aggregate is computed once —
      // no second aggregation branch re-reading the join.
      val bCum = bCounts
        .withColumn("cum_hi", sum($"c").over(wb))
        .withColumn("cum_lo", $"cum_hi" - $"c")
        .withColumn("cnt",
          max($"cum_hi").over(Window.partitionBy($"seg")))
        .withColumn("r_med", expr("(cnt+1) div 2"))
        .withColumn("r_p90", ceil($"cnt" * 0.9).cast(LongType))
      val hot = bCum
        .filter(($"cum_lo" < $"r_med" && $"r_med" <= $"cum_hi") ||
                ($"cum_lo" < $"r_p90" && $"r_p90" <= $"cum_hi"))
        .select($"seg", $"b", $"cum_lo", $"cnt", $"r_med", $"r_p90")
      val wr = Window.partitionBy($"seg", $"b")
        .orderBy($"price", $"o_orderkey")
      j.join(broadcast(hot), Seq("seg", "b"))
        .withColumn("rn", row_number().over(wr) + $"cum_lo")
        .groupBy($"seg")
        .agg(
          max(when($"rn" === $"r_med", $"price")).as("median_disc"),
          max(when($"rn" === $"r_p90", $"price")).as("p90_disc"),
          max($"cnt").as("n"))
        .orderBy($"seg")
    }),

    // ROLLUP with subtotals + grand total, grouping() disambiguated.
    "agg_rollup" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"),
             grouping($"o_orderstatus").as("g1"),
             grouping($"o_orderpriority").as("g2"))
        .select(
          when($"g1" === 1, "(all)").otherwise($"o_orderstatus").as("status_g"),
          when($"g2" === 1, "(all)").otherwise($"o_orderpriority").as("prio_g"),
          $"n", $"total")
        .orderBy($"status_g", $"prio_g")
    }),

    // CUBE: all grouping combos + grouping id.
    "agg_cube" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"),
             grouping($"o_orderstatus").as("g1"),
             grouping($"o_orderpriority").as("g2"))
        .select(
          when($"g1" === 1, "(all)").otherwise($"o_orderstatus").as("status_g"),
          when($"g2" === 1, "(all)").otherwise($"o_orderpriority").as("prio_g"),
          ($"g1" * 2 + $"g2").cast(LongType).as("gid"), $"n", $"total")
        .orderBy($"status_g", $"prio_g")
    }),

    // GROUPING SETS — SQL entry point (no DF-API equivalent).
    // min_by / max_by (r7): "which row was the extreme" without a
    // self-join or window — one aggregate carries the argument along
    // with the ordering value. BOTH engines leave ties unspecified,
    // so the ordering value is made UNIQUE by composing cents with
    // the orderkey (cents·10^9 + key, exact BIGINT) — the same §7.4
    // P5 tiebreak discipline windows use, applied to an aggregate.
    "agg_minmax_by" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .selectExpr("o_orderpriority", "o_orderkey",
          // o_orderkey loud-guarded < 10^9 (r8, advisor item 2): at
          // the composite's radix and beyond, ord collides/misorders
          // silently — plausible wrong answers, not a failure.
          "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " * 1000000000 + " +
            graft.Det.boundedExpr("o_orderkey", 1000000000L,
              "agg_minmax_by o_orderkey") + " AS ord")
        .groupBy($"o_orderpriority")
        .agg(expr("min_by(o_orderkey, ord)").as("cheapest_key"),
          expr("max_by(o_orderkey, ord)").as("dearest_key"),
          expr("min(ord) div 1000000000").as("min_cents"),
          expr("max(ord) div 1000000000").as("max_cents"))
        .orderBy($"o_orderpriority")
    }),

    // grouping_id over a rollup (r7): the bitset that tells subtotal
    // rows apart from genuine NULL group values — without it a
    // nullable dimension makes rollup output ambiguous. Both engines
    // use the same bit order (first column = most significant bit).
    "agg_grouping_id" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          Det.dsum($"l_quantity").as("sum_qty"))
        .orderBy($"gid", $"l_returnflag", $"l_linestatus")
    }),

    "agg_grouping_sets" -> ((s, dir) => {
      s.sql(
        s"""SELECT
           |  CASE WHEN GROUPING(o_orderstatus)=1 THEN '(all)'
           |       ELSE o_orderstatus END AS status_g,
           |  CASE WHEN GROUPING(o_orderpriority)=1 THEN '(all)'
           |       ELSE o_orderpriority END AS prio_g,
           |  COUNT(*) AS n,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           |FROM parquet.`$dir/orders.parquet`
           |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
           |ORDER BY status_g, prio_g""".stripMargin)
    }),

    // Collection aggregates, canonicalized to sorted CSV strings so
    // the cross-engine compare is list-representation-agnostic.
    // Scale note: per-user event counts are unbounded, so collecting
    // every value before slicing 3 risks executor OOM at 100 TB. A
    // window row_number (partitioned by the high-cardinality user_id)
    // pre-filters to rank<=3 so collect_list only ever sees <=3 rows
    // per group; collect_set(event_type) is bounded by the 5-value
    // event_type domain.
    "agg_collect" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"v", $"event_id")
      Tables.load(s, dir, "events")
        .select($"user_id", $"event_type", $"event_id",
          money($"value").cast(StringType).as("v"))
        .withColumn("rn", row_number().over(w))
        .groupBy($"user_id")
        .agg(
          array_join(array_sort(collect_set($"event_type")), ",")
            .as("types_csv"),
          array_join(array_sort(collect_list(when($"rn" <= 3, $"v"))), ",")
            .as("low3_csv"),
          count(lit(1)).as("n"))
        .orderBy($"user_id")
    }),

    // Deterministic first/last by unique ordering key (min_by/max_by).
    "agg_first_last" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .agg(min_by($"value", $"event_id").as("first_value"),
             max_by($"value", $"event_id").as("last_value"),
             min_by($"event_type", $"event_id").as("first_type"),
             max_by($"event_type", $"event_id").as("last_type"))
        .orderBy($"user_id")
    }),

    // Ordered string aggregation (LISTAGG, new SQL:2016 surface in
    // Spark 4). Scale-safe: a window rank bounds each group to 3 rows
    // BEFORE the aggregation, so no unbounded per-group string build.
    "agg_listagg" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment").orderBy($"c_custkey")
      Tables.load(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .groupBy($"c_mktsegment")
        .agg(expr(
          "listagg(c_name, ',') WITHIN GROUP (ORDER BY c_custkey)")
          .as("names"),
          count(lit(1)).as("n"))
        .orderBy($"c_mktsegment")
    }),

    // Custom typed UDAF (Aggregator): weighted mean of value by
    // props.k — exact integer-cents arithmetic inside the buffer.
    "agg_udaf" -> ((s, dir) => {
      import s.implicits._
      val wmean = udaf(WeightedMeanAgg)
      Tables.load(s, dir, "events")
        .select($"event_type",
          (money($"value") * 100).cast(LongType).as("cents"),
          get_json_object($"props", "$.k").cast(LongType).as("w"))
        .groupBy($"event_type")
        .agg(wmean($"cents", $"w").as("wmean"),
             sum($"w").as("sum_w"))
        .orderBy($"event_type")
    }),

    // Per-group mode with a deterministic tie-break (highest count,
    // then lowest value). Two-phase count then a per-group window —
    // shuffle volume is bounded by (segment, nation) cardinality, and
    // the window partitions on the group key, never globally.
    "agg_mode" -> ((s, dir) => {
      import s.implicits._
      val counts = Tables.load(s, dir, "customer")
        .groupBy($"c_mktsegment", $"c_nationkey")
        .agg(count(lit(1)).as("n_mode"))
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"n_mode".desc, $"c_nationkey".asc)
      counts.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"c_mktsegment", $"c_nationkey".as("mode_nation"),
                $"n_mode")
        .orderBy($"c_mktsegment")
    }),

    // Datasketches HLL with EXPLICIT distributed merge: 16 per-shard
    // sketches union-merged vs one global sketch over the same rows.
    // This is the 1000-executor cardinality path made visible — at
    // cluster scale every executor builds a shard sketch and only the
    // constant-size sketch bytes shuffle. est_merged == est_global
    // exactly (same lgK, merge is register-wise max — asserted in
    // ProfilerSpec along with the 3·rsd accuracy bound vs exact).
    // No DuckDB oracle by design (engine-specific sketch), like
    // agg_approx_distinct.
    "sketch_hll_merge" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .withColumn("shard", pmod($"user_id", lit(16)).cast(IntegerType))
      val merged = e.groupBy($"event_type", $"shard")
        .agg(hll_sketch_agg($"user_id", 12).as("sk"))
        .groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_union_agg($"sk", lit(false)))
               .as("est_merged"),
             count(lit(1)).as("n_shards"))
      val global = e.groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", 12))
               .as("est_global"),
             countDistinct($"user_id").as("exact"))
      merged.join(global, "event_type")
        .select($"event_type", $"n_shards", $"est_merged",
                $"est_global", $"exact")
        .orderBy($"event_type")
    }),

    // KMV (k-minimum-values) distinct sketch — the one sketch family
    // with an EXACT cross-engine oracle (r6 verdict item 6: HLL/
    // t-digest internals are engine-specific, but KMV's state is just
    // "the k smallest hash values", and md5 is bit-identical in every
    // engine). Estimator: (k-1) / normalized kth-min hash (Bar-Yossef
    // et al. 2002); both engines derive the 60-bit numeric value from
    // the same 15 hex chars, so the double estimate matches bit-for-
    // bit. MERGE is demonstrated structurally: per-day k-min partials
    // (the shard sketches — constant size, like the HLL registers)
    // union + dedupe + re-take-k-min into the global sketch, which
    // equals the unsharded sketch REGARDLESS of how rows were
    // partitioned (a global k-min hash has rank <= k in any subset
    // containing it) — that partition-independence is exactly why the
    // estimate is oracle-able while HLL's is not.
    // Scale: partials bound shuffle at k rows per (group, shard);
    // everything else is two window top-ks on tiny relations.
    "sketch_kmv" -> ((s, dir) => {
      import s.implicits._
      val k = 32
      // Distinct BEFORE hashing: the dedupe shuffle then carries an
      // 8-byte long, not a 32-char hex string, and md5 runs once per
      // distinct triple after the exchange.
      val hashed = Tables.load(s, dir, "events")
        .select($"event_type", to_date($"ts").as("d"), $"user_id")
        .distinct()
        .select($"event_type", $"d",
          md5($"user_id".cast(StringType)).as("h"))
      val partial = hashed
        .withColumn("rn", row_number().over(
          Window.partitionBy($"event_type", $"d").orderBy($"h")))
        .filter($"rn" <= k)
      val merged = partial.select($"event_type", $"h").distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy($"event_type").orderBy($"h")))
        .filter($"rn" <= k)
      merged.groupBy($"event_type")
        .agg(max($"h").as("kth_hash"), count(lit(1)).as("k_eff"))
        .withColumn("kth_val",
          expr("CAST(conv(substr(kth_hash, 1, 15), 16, 10) AS BIGINT)"))
        // 2^60 = 16^15: the kth hash normalized to [0,1) by its first
        // 15 hex digits. k_eff < k means the group had fewer than k
        // distinct hashes — the sketch IS the exact set.
        .withColumn("est_users",
          when($"k_eff" < k, $"k_eff".cast(DoubleType))
            .otherwise(($"k_eff" - lit(1)).cast(DoubleType) *
              lit(1152921504606846976.0) / $"kth_val".cast(DoubleType)))
        .select($"event_type", $"k_eff", $"kth_hash", $"est_users")
        .orderBy($"event_type")
    }),

    // EXACT distinct via OR-mergeable fixed-width bitmaps (Spark 3.5+
    // bitmap_* family) — the warehouse pattern for incremental/
    // distributed distinct counts: each shard (executor / ingest
    // batch) aggregates its ids into 4 KB bucket bitmaps, partials
    // merge by bitwise OR (associative, idempotent — re-processing a
    // shard cannot double-count), and the final count is a popcount
    // sum. Unlike HLL this is exact, so the DuckDB COUNT(DISTINCT)
    // oracle hash-matches; unlike countDistinct's expand+dedupe, the
    // shuffle payload is bounded at one 4 KB bitmap per (group,
    // 32768-id bucket) regardless of row count. The explicit
    // shard→merge stage is st10-style exactly-once bookkeeping made
    // visible in batch.
    "agg_bitmap_distinct" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"event_type",
          pmod($"event_id", lit(8L)).as("shard"),
          expr("bitmap_bucket_number(user_id)").as("bkt"),
          expr("bitmap_bit_position(user_id)").as("pos"))
      val partial = e.groupBy($"event_type", $"shard", $"bkt")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
      val merged = partial.groupBy($"event_type", $"bkt")
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
      merged.groupBy($"event_type")
        .agg(sum(expr("bitmap_count(bm)")).as("n_users"))
        .orderBy($"event_type")
    }),

    // KMV set ALGEBRA (r11c): pairwise union/Jaccard estimates
    // between event-type audiences computed entirely FROM THE
    // SKETCHES — the reason a warehouse keeps KMV instead of HLL:
    // k-min states are closed under union (K(A∪B) = k smallest of
    // K(A) ∪ K(B), the Beyer et al. '07 mergeability identity), so
    // every pairwise overlap query runs on 32-row sketches, never
    // re-scanning the corpus. The corpus is touched ONCE (the same
    // distinct→hash→per-type k-min pass as sketch_kmv); all 10 pair
    // combinations then work over ≤ 5·32 hashes. Jaccard estimator:
    // |K(A∪B) ∩ A-sketch ∩ B-sketch| / |K(A∪B)| in exact integer ppm
    // — every quantity is a deterministic set cardinality, so the
    // ESTIMATE itself hash-matches DuckDB exactly (the sketch_kmv
    // discipline: estimates are deterministic functions of exact
    // states).
    // EXACT bitmap set algebra (r11d): the exact twin of
    // sketch_kmv_ops. The per-(type, bucket) bitmap states built by
    // agg_bitmap_distinct are a reusable INDEX — audience-overlap
    // questions (how many users did both A and B?) answer from the
    // states alone, never re-scanning events. Spark 4 ships or-merge
    // (bitmap_or_agg) but no bitmap_and, so intersection uses
    // inclusion-exclusion: |A∩B| = |A| + |B| − |A∪B|, with |A∪B| one
    // bucket-keyed or-merge per pair — 10 pairs × a few 4 KB bitmaps
    // here, and at ANY corpus size the pair algebra runs over
    // state-sized relations (buckets × 4 KB), corpus-independent.
    // Jaccard is exact integer ppm over exact cardinalities, so the
    // whole overlap matrix hash-matches DuckDB's COUNT(DISTINCT)
    // ground truth.
    "sketch_bitmap_ops" -> ((s, dir) => {
      import s.implicits._
      val bm = graft.SessionCache.cached(s, s"bitmap.states:$dir") {
        Tables.load(s, dir, "events")
          .select($"event_type",
            expr("bitmap_bucket_number(user_id)").as("bkt"),
            expr("bitmap_bit_position(user_id)").as("pos"))
          .groupBy($"event_type", $"bkt")
          .agg(expr("bitmap_construct_agg(pos)").as("bm"))
      }
      val counts = bm.groupBy($"event_type")
        .agg(sum(expr("bitmap_count(bm)")).as("n"))
      val prs = counts.select($"event_type".as("ta"), $"n".as("na"))
        .join(counts.select($"event_type".as("tb"), $"n".as("nb")),
          $"ta" < $"tb")
      val unions = prs.select($"ta", $"tb")
        .join(bm, $"event_type" === $"ta" || $"event_type" === $"tb")
        .groupBy($"ta", $"tb", $"bkt")
        .agg(expr("bitmap_or_agg(bm)").as("u"))
        .groupBy($"ta", $"tb")
        .agg(sum(expr("bitmap_count(u)")).as("n_union"))
      prs.join(unions, Seq("ta", "tb"))
        .select($"ta", $"tb", $"na", $"nb", $"n_union",
          ($"na" + $"nb" - $"n_union").as("n_inter"),
          expr("(na + nb - n_union) * 1000000 div n_union")
            .as("jacc_ppm"))
        .orderBy($"ta", $"tb")
    }),

    "sketch_kmv_ops" -> ((s, dir) => {
      import s.implicits._
      val k = 32
      val ks = Tables.load(s, dir, "events")
        .select($"event_type", $"user_id").distinct()
        .select($"event_type", md5($"user_id".cast(StringType)).as("h"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"event_type").orderBy($"h")))
        .filter($"rn" <= k)
        .select($"event_type", $"h")
      val prs = ks.select($"event_type".as("ta")).distinct()
        .join(ks.select($"event_type".as("tb")).distinct(), $"ta" < $"tb")
      val u = prs
        .join(ks.withColumnRenamed("event_type", "t"),
          $"t" === $"ta" || $"t" === $"tb")
        .select($"ta", $"tb", $"h").distinct()
        .withColumn("rn", row_number().over(
          Window.partitionBy($"ta", $"tb").orderBy($"h")))
        .filter($"rn" <= k)
      val flagged = u
        .join(ks.select($"event_type".as("t1"), $"h".as("hx")),
          $"t1" === $"ta" && $"hx" === $"h", "left_outer")
        .withColumn("in_a", $"hx".isNotNull).drop("t1", "hx")
        .join(ks.select($"event_type".as("t2"), $"h".as("hy")),
          $"t2" === $"tb" && $"hy" === $"h", "left_outer")
        .withColumn("in_b", $"hy".isNotNull).drop("t2", "hy")
      flagged.groupBy($"ta", $"tb")
        .agg(count(lit(1)).as("k_eff"),
          sum(when($"in_a" && $"in_b", 1L).otherwise(0L)).as("j_hits"),
          max($"h").as("kth_hash"))
        .withColumn("jacc_ppm", expr("j_hits * 1000000 div k_eff"))
        .withColumn("kth_val",
          expr("CAST(conv(substr(kth_hash, 1, 15), 16, 10) AS BIGINT)"))
        .withColumn("est_union",
          when($"k_eff" < k, $"k_eff".cast(DoubleType))
            .otherwise(($"k_eff" - lit(1)).cast(DoubleType) *
              lit(1152921504606846976.0) / $"kth_val".cast(DoubleType)))
        .select($"ta", $"tb", $"k_eff", $"j_hits", $"jacc_ppm",
          $"est_union")
        .orderBy($"ta", $"tb")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    // Ground truth for the bitmap algebra: plain exact distincts.
    "sketch_bitmap_ops" ->
      """WITH a AS (SELECT DISTINCT event_type, user_id FROM events),
        |c AS (SELECT event_type, count(*) AS n FROM a
        |  GROUP BY event_type),
        |prs AS (SELECT x.event_type AS ta, x.n AS na,
        |    y.event_type AS tb, y.n AS nb
        |  FROM c x JOIN c y ON x.event_type < y.event_type),
        |u AS (SELECT p.ta, p.tb, count(DISTINCT a.user_id) AS n_union
        |  FROM prs p JOIN a ON a.event_type = p.ta
        |    OR a.event_type = p.tb
        |  GROUP BY p.ta, p.tb)
        |SELECT ta, tb, na, nb, n_union,
        |  na + nb - n_union AS n_inter,
        |  (na + nb - n_union) * 1000000 // n_union AS jacc_ppm
        |FROM prs JOIN u USING (ta, tb)
        |ORDER BY ta, tb""".stripMargin,

    "sketch_kmv_ops" ->
      """WITH ks AS (SELECT event_type, h FROM (
        |    SELECT event_type, h, row_number() OVER (
        |      PARTITION BY event_type ORDER BY h) AS rn
        |    FROM (SELECT DISTINCT event_type,
        |        md5(CAST(user_id AS VARCHAR)) AS h FROM events))
        |  WHERE rn <= 32),
        |prs AS (SELECT a.event_type AS ta, b.event_type AS tb
        |  FROM (SELECT DISTINCT event_type FROM ks) a
        |  JOIN (SELECT DISTINCT event_type FROM ks) b
        |    ON a.event_type < b.event_type),
        |u AS (SELECT ta, tb, h FROM (
        |    SELECT ta, tb, h, row_number() OVER (
        |      PARTITION BY ta, tb ORDER BY h) AS rn
        |    FROM (SELECT DISTINCT prs.ta, prs.tb, ks.h
        |      FROM prs JOIN ks
        |        ON ks.event_type = prs.ta OR ks.event_type = prs.tb))
        |  WHERE rn <= 32),
        |fl AS (SELECT u.ta, u.tb, u.h,
        |    ka.h IS NOT NULL AS in_a, kb.h IS NOT NULL AS in_b
        |  FROM u
        |  LEFT JOIN ks ka ON ka.event_type = u.ta AND ka.h = u.h
        |  LEFT JOIN ks kb ON kb.event_type = u.tb AND kb.h = u.h)
        |SELECT ta, tb, count(*) AS k_eff,
        |  CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
        |    AS BIGINT) AS j_hits,
        |  CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END)
        |    AS BIGINT) * 1000000 // count(*) AS jacc_ppm,
        |  CASE WHEN count(*) < 32 THEN CAST(count(*) AS DOUBLE)
        |    ELSE CAST(count(*) - 1 AS DOUBLE) * 1152921504606846976.0
        |      / CAST(CAST('0x' || substr(max(h), 1, 15) AS BIGINT)
        |             AS DOUBLE)
        |  END AS est_union
        |FROM fl GROUP BY ta, tb ORDER BY ta, tb""".stripMargin,

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
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "agg_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |       COUNT(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // hi/lo product sums (r11): value*10^4 = hi*10^9 + lo via HUGEINT
    // (exact 128-bit) — mirrors Det.hiLoSplit; derived doubles use the
    // same (hi * 100000.0 + lo / 10000.0) expression tree as Spark.
    "agg_stats" ->
      """WITH g AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sx_c,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS sxx4,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sy_c,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS syy4,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS sxy4
        |  FROM lineitem GROUP BY l_returnflag),
        |h AS (SELECT l_returnflag, n, sx_c, sy_c,
        |    CAST(sxx4 // 1000000000 AS BIGINT) AS sxx_hi,
        |    CAST(sxx4 % 1000000000 AS BIGINT) AS sxx_lo,
        |    CAST(syy4 // 1000000000 AS BIGINT) AS syy_hi,
        |    CAST(syy4 % 1000000000 AS BIGINT) AS syy_lo,
        |    CAST(sxy4 // 1000000000 AS BIGINT) AS sxy_hi,
        |    CAST(sxy4 % 1000000000 AS BIGINT) AS sxy_lo
        |  FROM g)
        |SELECT l_returnflag, n, sx_c, sy_c, sxx_hi, sxx_lo,
        |  syy_hi, syy_lo, sxy_hi, sxy_lo,
        |  sx_c / 100.0 / n AS mean_qty,
        |  round(((sxx_hi * 100000.0 + sxx_lo / 10000.0) - (sx_c / 100.0) * (sx_c / 100.0) / n)
        |    / (n - 1), 6) AS var_qty,
        |  round(sqrt(((sxx_hi * 100000.0 + sxx_lo / 10000.0) - (sx_c / 100.0) * (sx_c / 100.0) / n)
        |    / (n - 1)), 6) AS std_qty,
        |  round((n * (sxy_hi * 100000.0 + sxy_lo / 10000.0) - (sx_c / 100.0) * (sy_c / 100.0)) /
        |    (sqrt(n * (sxx_hi * 100000.0 + sxx_lo / 10000.0) - (sx_c / 100.0) * (sx_c / 100.0)) *
        |     sqrt(n * (syy_hi * 100000.0 + syy_lo / 10000.0) - (sy_c / 100.0) * (sy_c / 100.0))),
        |    12) AS corr_qty_price
        |FROM h ORDER BY l_returnflag""".stripMargin,

    "agg_regression" ->
      """WITH g AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sx_c,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS sxx4,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sy_c,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS syy4,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS sxy4
        |  FROM lineitem GROUP BY l_returnflag),
        |h AS (SELECT l_returnflag, n, sx_c, sy_c,
        |    CAST(sxx4 // 1000000000 AS BIGINT) * 100000.0 + CAST(sxx4 % 1000000000 AS BIGINT) / 10000.0 AS sxxd,
        |    CAST(syy4 // 1000000000 AS BIGINT) * 100000.0 + CAST(syy4 % 1000000000 AS BIGINT) / 10000.0 AS syyd,
        |    CAST(sxy4 // 1000000000 AS BIGINT) * 100000.0 + CAST(sxy4 % 1000000000 AS BIGINT) / 10000.0 AS sxyd
        |  FROM g)
        |SELECT l_returnflag, n,
        |  round((n * sxyd - (sx_c / 100.0) * (sy_c / 100.0)) /
        |    (n * sxxd - (sx_c / 100.0) * (sx_c / 100.0)),
        |    12) AS slope,
        |  round(((sy_c / 100.0) * sxxd - (sx_c / 100.0) * sxyd) /
        |    (n * sxxd - (sx_c / 100.0) * (sx_c / 100.0)),
        |    12) AS intercept,
        |  round(((n * sxyd - (sx_c / 100.0) * (sy_c / 100.0)) *
        |     (n * sxyd - (sx_c / 100.0) * (sy_c / 100.0))) /
        |    ((n * sxxd - (sx_c / 100.0) * (sx_c / 100.0)) *
        |     (n * syyd - (sy_c / 100.0) * (sy_c / 100.0))),
        |    12) AS r2
        |FROM h ORDER BY l_returnflag""".stripMargin,

    "agg_percentile" ->
      """SELECT seg,
        |  MAX(CASE WHEN rn = (cnt+1)//2 THEN price END) AS median_disc,
        |  MAX(CASE WHEN rn = CAST(CEIL(cnt*0.9) AS BIGINT) THEN price END) AS p90_disc,
        |  MAX(cnt) AS n
        |FROM (
        |  SELECT c_mktsegment AS seg, o_totalprice AS price,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |GROUP BY seg ORDER BY seg""".stripMargin,

    "agg_rollup" ->
      """SELECT
        |  CASE WHEN GROUPING(o_orderstatus)=1 THEN '(all)' ELSE o_orderstatus END AS status_g,
        |  CASE WHEN GROUPING(o_orderpriority)=1 THEN '(all)' ELSE o_orderpriority END AS prio_g,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY status_g, prio_g""".stripMargin,

    "agg_cube" ->
      """SELECT
        |  CASE WHEN GROUPING(o_orderstatus)=1 THEN '(all)' ELSE o_orderstatus END AS status_g,
        |  CASE WHEN GROUPING(o_orderpriority)=1 THEN '(all)' ELSE o_orderpriority END AS prio_g,
        |  GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status_g, prio_g""".stripMargin,

    "agg_minmax_by" ->
      """WITH o AS (SELECT o_orderpriority, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      * 1000000000 + o_orderkey AS ord
        |  FROM orders)
        |SELECT o_orderpriority,
        |  arg_min(o_orderkey, ord) AS cheapest_key,
        |  arg_max(o_orderkey, ord) AS dearest_key,
        |  CAST(min(ord) // 1000000000 AS BIGINT) AS min_cents,
        |  CAST(max(ord) // 1000000000 AS BIGINT) AS max_cents
        |FROM o GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "agg_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "agg_grouping_sets" ->
      """SELECT
        |  CASE WHEN GROUPING(o_orderstatus)=1 THEN '(all)' ELSE o_orderstatus END AS status_g,
        |  CASE WHEN GROUPING(o_orderpriority)=1 THEN '(all)' ELSE o_orderpriority END AS prio_g,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status_g, prio_g""".stripMargin,

    "agg_collect" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
        |  array_to_string(list_sort(list(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)))[1:3], ',') AS low3_csv,
        |  COUNT(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "agg_first_last" ->
      """SELECT user_id,
        |  arg_min(value, event_id) AS first_value,
        |  arg_max(value, event_id) AS last_value,
        |  arg_min(event_type, event_id) AS first_type,
        |  arg_max(event_type, event_id) AS last_type
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "agg_listagg" ->
      """SELECT c_mktsegment,
        |  string_agg(c_name, ',' ORDER BY c_custkey) AS names,
        |  count(*) AS n
        |FROM (SELECT c_mktsegment, c_custkey, c_name,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_custkey) AS rn
        |      FROM customer) t
        |WHERE rn <= 3
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "agg_udaf" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           * CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
        |  / (100.0 * CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)) AS wmean,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_w
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "agg_mode" ->
      """WITH c AS (SELECT c_mktsegment, c_nationkey, count(*) AS n_mode
        |  FROM customer GROUP BY c_mktsegment, c_nationkey),
        |r AS (SELECT c_mktsegment, c_nationkey, n_mode,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY n_mode DESC, c_nationkey) AS rn
        |  FROM c)
        |SELECT c_mktsegment, c_nationkey AS mode_nation, n_mode
        |FROM r WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin,

    // Mirrors the Spark KMV exactly: same md5 hex strings, same
    // per-day partial k-min / merged global k-min (partition-
    // independent), same 60-bit normalization ((k-1) * 2^60 / kth) —
    // doubles match bit-for-bit because both engines divide the same
    // integers.
    "sketch_kmv" ->
      """WITH hashed AS (SELECT DISTINCT event_type,
        |    date_trunc('day', ts) AS d,
        |    md5(CAST(user_id AS VARCHAR)) AS h FROM events),
        |partial AS (SELECT event_type, h FROM (
        |    SELECT event_type, h,
        |      row_number() OVER (PARTITION BY event_type, d
        |                         ORDER BY h) AS rn
        |    FROM hashed) t WHERE rn <= 32),
        |merged AS (SELECT event_type, h FROM (
        |    SELECT event_type, h,
        |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        |    FROM (SELECT DISTINCT event_type, h FROM partial) u) v
        |  WHERE rn <= 32),
        |g AS (SELECT event_type, max(h) AS kth_hash,
        |    count(*) AS k_eff FROM merged GROUP BY event_type)
        |SELECT event_type, CAST(k_eff AS BIGINT) AS k_eff, kth_hash,
        |  CASE WHEN k_eff < 32 THEN CAST(k_eff AS DOUBLE)
        |       ELSE CAST(k_eff - 1 AS DOUBLE) * 1152921504606846976.0
        |            / CAST(CAST('0x' || substr(kth_hash, 1, 15)
        |                        AS BIGINT) AS DOUBLE) END AS est_users
        |FROM g ORDER BY event_type""".stripMargin,

    // The bitmap pipeline is EXACT, so the oracle is the plain
    // distinct count — any bit-position/merge bug hash-mismatches.
    "agg_bitmap_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
