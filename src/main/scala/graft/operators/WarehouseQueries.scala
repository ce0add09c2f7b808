package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Warehouse-modeling operators (SURVEY.md §2.L extension, r7b):
  * slowly-changing-dimension history, equi-depth bucketing, and the
  * pairwise correlation matrix.
  *
  * - `dim_scd2` — SCD type-2 history build: collapse an event stream
  *   into versioned dimension rows (valid_from / valid_to / current
  *   flag), writing a row only when the tracked attribute CHANGES.
  *   This is `cdc_apply`'s upstream twin: CDC reconciles a snapshot,
  *   SCD2 keeps the full history. Two per-user window passes (lag to
  *   detect change, lead over the collapsed rows for the validity
  *   interval) — both partitioned by the high-cardinality user key,
  *   O(1) frame state, one hash exchange total (the second window
  *   reuses the first's partitioning).
  * - `win_ntile` — equi-depth quartiles per market segment (the
  *   feature-binning step of every tabular-training pipeline). The
  *   window ORDER BY carries the unique c_custkey tiebreaker so tile
  *   assignment is total (§7.4 P5); output is the per-(segment, tile)
  *   audit aggregate, not 30k raw rows.
  * - `agg_corrmatrix` — all three pairwise Pearson correlations of
  *   (quantity, extendedprice, discount) per returnflag in ONE
  *   two-phase aggregate pass (9 power sums + n, shuffle width = 5
  *   groups). Same determinism discipline as `agg_regression`: exact
  *   cent-scaled DECIMAL sums asserted into BIGINT (`Det.centsLong`,
  *   loud overflow), then one fixed IEEE expression per output whose
  *   formula text is byte-identical in the DuckDB oracle — never the
  *   engines' native corr(), whose accumulation order differs.
  */
object WarehouseQueries extends QueryPack {

  /** corr(x,y) from cent-scaled integer power sums, as the one fixed
    * IEEE expression both engines evaluate (mirrors agg_regression's
    * slope/r² shape; sqrt is IEEE-correctly-rounded in both). */
  /** Pearson r from exact sums: linear sums arrive as cent-scaled
    * BIGINT columns (divided to doubles here); product sums as
    * hi/lo-split doubles (`Det.hiLoDouble`, r11 — single-BIGINT
    * cent-scaling overflowed at the sf1 staging). Same IEEE tree as
    * the oracle SQL. */
  private def corrExpr(n: String, sx: String, sy: String,
                       sxyD: org.apache.spark.sql.Column,
                       sxxD: org.apache.spark.sql.Column,
                       syyD: org.apache.spark.sql.Column,
                       fx: Double, fy: Double,
                       nm: String) =
    round(((col(n) * sxyD) - (col(sx) / fx) * (col(sy) / fy)) /
      (sqrt(col(n) * sxxD -
        (col(sx) / fx) * (col(sx) / fx)) *
       sqrt(col(n) * syyD -
        (col(sy) / fy) * (col(sy) / fy))), 12).as(nm)

  /** SCD2 history build (shared by dim_scd2 and dim_snapshot).
    * Tracked attribute: the spend tier of each purchase. NULL value
    * falls to 'high' via otherwise() — same CASE/ELSE path both
    * engines. Pass 1 keeps only change rows (first row per user
    * counts as a change); pass 2, over the collapsed rows with the
    * same partitioning (Catalyst reuses the exchange), adds the
    * validity interval + version. */
  /** The tracked-attribute derivation (spend tier per purchase);
    * `pred` restricts the stream (the merge key's cutoff). */
  private def tiered(s: org.apache.spark.sql.SparkSession, dir: String,
                     pred: Option[org.apache.spark.sql.Column] = None) = {
    import s.implicits._
    val base = Tables.load(s, dir, "events")
      .filter($"event_type" === "purchase")
    pred.map(base.filter).getOrElse(base)
      .select($"user_id", $"ts", $"event_id",
        when($"value" < 100, "low").when($"value" < 500, "mid")
          .otherwise("high").as("tier"))
  }

  /** Thin adapter over graft.api.Warehouse.scd2 (shared by dim_scd2,
    * dim_snapshot, and the merge key's history side) — the DuckDB
    * oracle proves the API function. */
  private def scd2(s: org.apache.spark.sql.SparkSession, dir: String,
                   pred: Option[org.apache.spark.sql.Column] = None) =
    graft.api.Warehouse.scd2(tiered(s, dir, pred),
      "user_id", "ts", "event_id", "tier")

  def queries: Seq[(String, Q)] = Seq(

    "dim_scd2" -> ((s, dir) =>
      scd2(s, dir).orderBy(col("user_id"), col("version"))),

    // Point-in-time FACT ENRICHMENT over the SCD2 history (r11d) —
    // the query the history exists FOR: every view event picks up the
    // user's spend tier AS OF the event's own timestamp (not today's
    // tier — the classic training-label leak this op exists to
    // prevent). Join is keyed by the dimension's natural key
    // (user_id) with the validity interval as a post-match predicate:
    // each fact row matches AT MOST ONE history version (intervals
    // partition time by construction), so there is no row
    // multiplication; views before the user's first purchase (or from
    // never-purchasers) keep tier 'none' via the left join. At 100 TB
    // the history is bounded by CHANGE COUNT (<< fact count) — either
    // broadcast or co-partitioned with the facts on user_id; the
    // session cache stands in for the stored history table.
    "dim_lookup_pit" -> ((s, dir) => {
      import s.implicits._
      val hist = graft.SessionCache.cached(s, s"scd2.full:$dir") {
        scd2(s, dir)
      }
      val facts = Tables.load(s, dir, "events")
        .filter($"event_type" === "view")
        .select($"user_id".as("uid"),
          unix_micros($"ts").as("ts_us"), $"value")
      graft.api.Warehouse
        .pitLookup(facts, "uid", "ts_us", hist, "user_id", "tier")
        .select(coalesce($"tier", lit("none")).as("tier"),
          $"uid", $"value")
        .groupBy($"tier")
        .agg(count(lit(1)).as("n_views"),
          countDistinct($"uid").as("n_users"),
          Det.dsum($"value").as("sum_value"))
        .orderBy($"tier")
    }),

    // Point-in-time (AS OF) snapshot over the SCD2 history — the
    // query side of dim_scd2's build side: the dimension as it stood
    // at T is the rows whose validity interval covers T. One filter
    // over the history; at scale the history table is partitioned by
    // a valid_from time bucket so the snapshot prunes to a few
    // partitions.
    "dim_snapshot" -> ((s, dir) => {
      import s.implicits._
      val tUs = java.time.Instant.parse("2024-01-15T00:00:00Z")
        .toEpochMilli * 1000L
      scd2(s, dir)
        .filter($"valid_from" <= tUs &&
          ($"valid_to".isNull || $"valid_to" > tUs))
        .select($"user_id", $"version", $"tier", $"valid_from")
        .orderBy($"user_id")
    }),

    // Incremental SCD2 MERGE (r11c): the operation a 100-TB warehouse
    // actually runs nightly — dim_scd2 rebuilds history from all of
    // time, but at scale the history table is a stored artifact and
    // only the day's delta is new. This key merges the delta batch
    // (events ≥ T) into the pre-T history with the standard three-way
    // algebra: (1) detect tier changes INSIDE the delta with the same
    // lag pass as the full build, seeding each user's first delta row
    // against their CURRENT open tier (left join on the history's
    // is_current slice — the last pre-T purchase's tier by
    // construction, so the change test is exactly the full build's);
    // (2) version new rows by offsetting row_number with the user's
    // stored max version; (3) close each affected user's open row at
    // the first new change's valid_from. All joins are keyed by
    // user_id (the dimension's natural key) and the delta side is
    // small, so the history shuffles once against a day's changes —
    // never re-sorts all of time.
    //
    // The correctness claim is the strongest available: the oracle is
    // the FULL-RANGE rebuild (dim_scd2's own SQL) — incremental merge
    // ≡ recompute, row for row, version for version.
    // Thin adapter over graft.api.Warehouse.scd2Merge — the DuckDB
    // oracle (the FULL rebuild SQL) proves the API's merge ≡
    // recompute claim.
    "dim_scd2_merge" -> ((s, dir) => {
      import s.implicits._
      val t = java.time.Instant.parse("2024-01-16T00:00:00Z")
      // At scale the pre-T history is a STORED table, not a
      // recomputation — session-cache stands in for that storage so
      // the one plan doesn't rebuild the window pass per consumer
      // (hist feeds the current-tier slice AND the close/union pass;
      // uncached, the plan carried 5 FileScans and 9 window ops).
      val hist = graft.SessionCache.cached(s, s"scd2.hist:$dir") {
        scd2(s, dir, Some($"ts" < lit(t)))
      }
      val delta = tiered(s, dir, Some($"ts" >= lit(t)))
      graft.api.Warehouse.scd2Merge(hist, delta,
          "user_id", "ts", "event_id", "tier")
        .orderBy($"user_id", $"version")
    }),

    // Incremental MATERIALIZED-VIEW maintenance (r11d): the
    // aggregate twin of dim_scd2_merge. A 100-TB warehouse never
    // recomputes its per-(type, day) rollup from all of time — it
    // stores the aggregate STATE and folds in the day's delta. The
    // state here is the mergeable partial (n, sum, min, max): count
    // and sum add, min/max combine, so merge = union the stored and
    // delta partials and re-aggregate — one shuffle of state-sized
    // relations (bounded by |group keys|, not |events|). Day is
    // integer epoch-microseconds div 86400e6 (never engine date
    // functions — the ts_seasonality cross-engine discipline);
    // value folds through exact cents. The correctness claim is the
    // strongest available: the ORACLE IS THE FULL RECOMPUTE —
    // incremental ≡ recompute row-for-row — and cut-invariance
    // (any two cutoffs merge to the same view) is law-asserted in
    // R11dOpsSpec.
    "agg_incremental" -> ((s, dir) => {
      import s.implicits._
      val t = java.time.Instant.parse("2024-01-16T00:00:00Z")
      def partial(pred: org.apache.spark.sql.Column) =
        Tables.load(s, dir, "events").filter(pred)
          .select($"event_type",
            expr("unix_micros(ts) div 86400000000").as("day"),
            Det.centsLong(Det.money($"value"), 100, "cents"),
            $"event_id")
          .groupBy($"event_type", $"day")
          .agg(count(lit(1)).as("n"), sum($"cents").as("sum_cents"),
            min($"event_id").as("min_id"), max($"event_id").as("max_id"))
      // The stored MV state (pre-T), session-cached as the stand-in
      // for the persisted table; the delta partial is the day's batch.
      val hist = graft.SessionCache.cached(s, s"mv.hist:$dir") {
        partial($"ts" < lit(t))
      }
      hist.unionByName(partial($"ts" >= lit(t)))
        .groupBy($"event_type", $"day")
        .agg(sum($"n").as("n"), sum($"sum_cents").as("sum_cents"),
          min($"min_id").as("min_id"), max($"max_id").as("max_id"))
        .orderBy($"event_type", $"day")
    }),

    "win_ntile" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "customer")
        .withColumn("tile", ntile(4).over(
          Window.partitionBy($"c_mktsegment")
            .orderBy($"c_acctbal", $"c_custkey")).cast(LongType))
        .groupBy($"c_mktsegment", $"tile")
        .agg(count(lit(1)).as("n"),
          Det.dsum($"c_acctbal").as("sum_bal"),
          min($"c_custkey").as("min_cust"),
          max($"c_custkey").as("max_cust"))
        .orderBy($"c_mktsegment", $"tile")
    }),

    // Gini impurity of the label distribution per group — the
    // dataset-balance audit (is one status swamping a partition?).
    // Chosen over Shannon entropy DELIBERATELY: entropy needs log(),
    // which libm does not guarantee correctly-rounded (it would break
    // the cross-engine hash), while Gini is rational — exact BIGINT
    // count power sums into one deterministic IEEE division, the
    // agg_regression discipline.
    "agg_gini" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("c"))
        .groupBy($"l_returnflag")
        .agg(sum($"c").as("n"), count(lit(1)).as("n_labels"),
          sum($"c" * $"c").as("sum_sq"))
        .select($"l_returnflag", $"n", $"n_labels",
          round(lit(1.0) - $"sum_sq".cast(DoubleType) /
            ($"n".cast(DoubleType) * $"n".cast(DoubleType)), 12)
            .as("gini"))
        .orderBy($"l_returnflag")
    }),

    // Skewness + excess kurtosis per group — the distribution-shape
    // audit (heavy tails / asymmetry) run before normalizing a
    // feature. l_quantity is integral (1..50, verified), so all four
    // power sums are exact BIGINTs (50^4 x 6e5 rows ~ 4e12, far
    // inside int64); the moments are then ONE fixed IEEE expression
    // whose text is byte-identical in the oracle — the denominators
    // use d*sqrt(d), never pow(d, 1.5) (pow is not correctly-rounded
    // everywhere; sqrt and multiply are).
    "agg_skewkurt" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .selectExpr("l_returnflag",
          "CAST(l_quantity AS BIGINT) AS q")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), sum($"q").as("s1"),
          sum($"q" * $"q").as("s2"),
          sum($"q" * $"q" * $"q").as("s3"),
          sum($"q" * $"q" * $"q" * $"q").as("s4"))
        .selectExpr("l_returnflag", "n",
          "round((s3 / n - 3 * (s1 / n) * (s2 / n)" +
            " + 2 * (s1 / n) * (s1 / n) * (s1 / n))" +
            " / ((s2 / n - (s1 / n) * (s1 / n))" +
            " * sqrt(s2 / n - (s1 / n) * (s1 / n))), 12) AS skew",
          "round((s4 / n - 4 * (s1 / n) * (s3 / n)" +
            " + 6 * (s1 / n) * (s1 / n) * (s2 / n)" +
            " - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))" +
            " / ((s2 / n - (s1 / n) * (s1 / n))" +
            " * (s2 / n - (s1 / n) * (s1 / n))) - 3, 12)" +
            " AS kurt_excess")
        .orderBy($"l_returnflag")
    }),

    // Weighted lower median + weighted p90 (r11d): "the quantity
    // below which half the REVENUE sits" — the mass-weighted quantile
    // every curation pipeline runs (token-mass-weighted doc length,
    // byte-weighted file size). Exact by construction: weights are
    // cent-scaled BIGINTs (loud overflow via Det.centsLong), the
    // domain collapses to ≤50 distinct (flag, quantity) rows in a
    // two-phase aggregate BEFORE any window — the running-sum windows
    // scan ~150 rows total at ANY corpus size (the agg_percentile
    // discipline: aggregate first, sort never) — and the pick is
    // "min q with 2·cumweight ≥ total", pure integer comparisons.
    "agg_weighted_median" -> ((s, dir) => {
      import s.implicits._
      val w = Tables.load(s, dir, "lineitem")
        .select($"l_returnflag", $"l_quantity".cast(LongType).as("q"),
          Det.money($"l_extendedprice").as("price"))
        .groupBy($"l_returnflag", $"q")
        .agg(Det.centsLong(sum($"price"), 100, "w"))
      val cum = w
        .withColumn("cw", sum($"w").over(
          Window.partitionBy($"l_returnflag").orderBy($"q")))
        .withColumn("tot", sum($"w").over(
          Window.partitionBy($"l_returnflag")))
      cum.groupBy($"l_returnflag")
        .agg(min(when($"cw" * 2 >= $"tot", $"q")).as("w_median"),
          min(when($"cw" * 10 >= $"tot" * 9, $"q")).as("w_p90"),
          max($"tot").as("w_cents"))
        .orderBy($"l_returnflag")
    }),

    "agg_corrmatrix" -> ((s, dir) => {
      import s.implicits._
      import Det.money
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(money($"l_quantity")).as("dq"),
          sum(money($"l_extendedprice")).as("dp"),
          sum(money($"l_discount")).as("dd"),
          sum(money($"l_quantity") * money($"l_quantity")).as("dqq"),
          sum(money($"l_extendedprice") * money($"l_extendedprice"))
            .as("dpp"),
          sum(money($"l_discount") * money($"l_discount")).as("ddd"),
          sum(money($"l_quantity") * money($"l_extendedprice")).as("dqp"),
          sum(money($"l_quantity") * money($"l_discount")).as("dqd"),
          sum(money($"l_extendedprice") * money($"l_discount")).as("dpd"))
        .select(Seq($"l_returnflag", $"n",
          Det.centsLong($"dq", 100, "sq_c"),
          Det.centsLong($"dp", 100, "sp_c"),
          Det.centsLong($"dd", 100, "sd_c")) ++
          Det.hiLoSplit($"dqq", "sqq") ++
          Det.hiLoSplit($"dpp", "spp") ++
          Det.hiLoSplit($"ddd", "sdd") ++
          Det.hiLoSplit($"dqp", "sqp") ++
          Det.hiLoSplit($"dqd", "sqd") ++
          Det.hiLoSplit($"dpd", "spd"): _*)
        .select($"l_returnflag", $"n",
          corrExpr("n", "sq_c", "sp_c", Det.hiLoDouble("sqp"),
            Det.hiLoDouble("sqq"), Det.hiLoDouble("spp"),
            100.0, 100.0, "corr_qty_price"),
          corrExpr("n", "sq_c", "sd_c", Det.hiLoDouble("sqd"),
            Det.hiLoDouble("sqq"), Det.hiLoDouble("sdd"),
            100.0, 100.0, "corr_qty_disc"),
          corrExpr("n", "sp_c", "sd_c", Det.hiLoDouble("spd"),
            Det.hiLoDouble("spp"), Det.hiLoDouble("sdd"),
            100.0, 100.0, "corr_price_disc"))
        .orderBy($"l_returnflag")
    }))

  /** Full-range SCD2 rebuild SQL — the oracle for BOTH dim_scd2 and
    * dim_scd2_merge: the incremental merge must equal the rebuild
    * row for row, which is the entire correctness claim of the merge
    * path. */
  private val scd2Sql =
    """WITH tiered AS (SELECT user_id, ts, event_id,
      |    CASE WHEN value < 100 THEN 'low'
      |         WHEN value < 500 THEN 'mid' ELSE 'high' END AS tier
      |  FROM events WHERE event_type = 'purchase'),
      |flagged AS (SELECT *,
      |    lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev FROM tiered),
      |changes AS (SELECT user_id, ts, event_id, tier FROM flagged
      |  WHERE prev IS NULL OR prev <> tier)
      |SELECT user_id,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    AS version,
      |  tier,
      |  epoch_us(ts) AS valid_from,
      |  epoch_us(lead(ts) OVER (PARTITION BY user_id
      |                          ORDER BY ts, event_id)) AS valid_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |    IS NULL AS is_current
      |FROM changes ORDER BY user_id, version""".stripMargin

  def oracle: Seq[(String, String)] = Seq(

    "dim_scd2" -> scd2Sql,

    "dim_scd2_merge" -> scd2Sql,

    // Point-in-time enrichment: the same hist CTEs, then every view
    // joins the version whose validity interval covers its timestamp.
    "dim_lookup_pit" ->
      """WITH tiered AS (SELECT user_id, ts, event_id,
        |    CASE WHEN value < 100 THEN 'low'
        |         WHEN value < 500 THEN 'mid' ELSE 'high' END AS tier
        |  FROM events WHERE event_type = 'purchase'),
        |flagged AS (SELECT *,
        |    lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev FROM tiered),
        |changes AS (SELECT user_id, ts, event_id, tier FROM flagged
        |  WHERE prev IS NULL OR prev <> tier),
        |hist AS (SELECT user_id, tier,
        |    epoch_us(ts) AS valid_from,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id)) AS valid_to
        |  FROM changes),
        |v AS (SELECT user_id AS uid, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE event_type = 'view')
        |SELECT COALESCE(h.tier, 'none') AS tier,
        |  count(*) AS n_views,
        |  count(DISTINCT v.uid) AS n_users,
        |  CAST(sum(CAST(v.value AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_value
        |FROM v LEFT JOIN hist h ON h.user_id = v.uid
        |  AND h.valid_from <= v.ts_us
        |  AND (h.valid_to IS NULL OR v.ts_us < h.valid_to)
        |GROUP BY 1 ORDER BY tier""".stripMargin,

    // Full recompute — the merge must equal it row-for-row.
    "agg_incremental" ->
      """WITH g AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day, value, event_id
        |  FROM events)
        |SELECT event_type, CAST(day AS BIGINT) AS day,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
        |    AS sum_cents,
        |  min(event_id) AS min_id, max(event_id) AS max_id
        |FROM g GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,

    "agg_weighted_median" ->
      """WITH w AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS q,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100
        |         AS BIGINT) AS w
        |  FROM lineitem GROUP BY l_returnflag, q),
        |c AS (SELECT l_returnflag, q, w,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY q) AS cw,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM w)
        |SELECT l_returnflag,
        |  min(CASE WHEN cw * 2 >= tot THEN q END) AS w_median,
        |  min(CASE WHEN cw * 10 >= tot * 9 THEN q END) AS w_p90,
        |  CAST(max(tot) AS BIGINT) AS w_cents
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "dim_snapshot" ->
      """WITH tiered AS (SELECT user_id, ts, event_id,
        |    CASE WHEN value < 100 THEN 'low'
        |         WHEN value < 500 THEN 'mid' ELSE 'high' END AS tier
        |  FROM events WHERE event_type = 'purchase'),
        |flagged AS (SELECT *,
        |    lag(tier) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev FROM tiered),
        |changes AS (SELECT user_id, ts, event_id, tier FROM flagged
        |  WHERE prev IS NULL OR prev <> tier),
        |hist AS (SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY ts, event_id) AS version,
        |    tier,
        |    epoch_us(ts) AS valid_from,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id)) AS valid_to
        |  FROM changes)
        |SELECT user_id, version, tier, valid_from FROM hist
        |WHERE valid_from <= 1705276800000000
        |  AND (valid_to IS NULL OR valid_to > 1705276800000000)
        |ORDER BY user_id""".stripMargin,

    "win_ntile" ->
      """WITH t AS (SELECT c_mktsegment, c_acctbal, c_custkey,
        |    ntile(4) OVER (PARTITION BY c_mktsegment
        |                   ORDER BY c_acctbal, c_custkey) AS tile
        |  FROM customer)
        |SELECT c_mktsegment, tile, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |  min(c_custkey) AS min_cust, max(c_custkey) AS max_cust
        |FROM t GROUP BY c_mktsegment, tile
        |ORDER BY c_mktsegment, tile""".stripMargin,

    "agg_gini" ->
      """WITH counts AS (SELECT l_returnflag, l_linestatus,
        |    count(*) AS c FROM lineitem
        |  GROUP BY l_returnflag, l_linestatus),
        |g AS (SELECT l_returnflag, CAST(sum(c) AS BIGINT) AS n,
        |    count(*) AS n_labels, CAST(sum(c * c) AS BIGINT) AS sum_sq
        |  FROM counts GROUP BY l_returnflag)
        |SELECT l_returnflag, n, n_labels,
        |  round(1.0 - CAST(sum_sq AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 12) AS gini
        |FROM g ORDER BY l_returnflag""".stripMargin,

    "agg_skewkurt" ->
      """WITH g AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
        |    CAST(sum(CAST(l_quantity AS BIGINT)
        |             * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
        |    CAST(sum(CAST(l_quantity AS BIGINT)
        |             * CAST(l_quantity AS BIGINT)
        |             * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
        |    CAST(sum(CAST(l_quantity AS BIGINT)
        |             * CAST(l_quantity AS BIGINT)
        |             * CAST(l_quantity AS BIGINT)
        |             * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((s3 / n - 3 * (s1 / n) * (s2 / n)
        |    + 2 * (s1 / n) * (s1 / n) * (s1 / n))
        |    / ((s2 / n - (s1 / n) * (s1 / n))
        |    * sqrt(s2 / n - (s1 / n) * (s1 / n))), 12) AS skew,
        |  round((s4 / n - 4 * (s1 / n) * (s3 / n)
        |    + 6 * (s1 / n) * (s1 / n) * (s2 / n)
        |    - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
        |    / ((s2 / n - (s1 / n) * (s1 / n))
        |    * (s2 / n - (s1 / n) * (s1 / n))) - 3, 12) AS kurt_excess
        |FROM g ORDER BY l_returnflag""".stripMargin,

    // hi/lo product sums (r11): value*10^4 = hi*10^9 + lo via exact
    // 128-bit HUGEINT — mirrors Det.hiLoSplit; the derived doubles use
    // the same (hi * 100000.0 + lo / 10000.0) tree as Spark.
    "agg_corrmatrix" ->
      """WITH g AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sq_c,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sp_c,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) * 100 AS BIGINT) AS sd_c,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS sqq4,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS spp4,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS sdd4,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS sqp4,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS sqd4,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) * 10000 AS HUGEINT) AS spd4
        |  FROM lineitem GROUP BY l_returnflag),
        |h AS (SELECT l_returnflag, n, sq_c, sp_c, sd_c,
        |    CAST(sqq4 // 1000000000 AS BIGINT) * 100000.0 + CAST(sqq4 % 1000000000 AS BIGINT) / 10000.0 AS sqqd,
        |    CAST(spp4 // 1000000000 AS BIGINT) * 100000.0 + CAST(spp4 % 1000000000 AS BIGINT) / 10000.0 AS sppd,
        |    CAST(sdd4 // 1000000000 AS BIGINT) * 100000.0 + CAST(sdd4 % 1000000000 AS BIGINT) / 10000.0 AS sddd,
        |    CAST(sqp4 // 1000000000 AS BIGINT) * 100000.0 + CAST(sqp4 % 1000000000 AS BIGINT) / 10000.0 AS sqpd,
        |    CAST(sqd4 // 1000000000 AS BIGINT) * 100000.0 + CAST(sqd4 % 1000000000 AS BIGINT) / 10000.0 AS sqdd,
        |    CAST(spd4 // 1000000000 AS BIGINT) * 100000.0 + CAST(spd4 % 1000000000 AS BIGINT) / 10000.0 AS spdd
        |  FROM g)
        |SELECT l_returnflag, n,
        |  round((n * sqpd - (sq_c / 100.0) * (sp_c / 100.0)) /
        |    (sqrt(n * sqqd - (sq_c / 100.0) * (sq_c / 100.0)) *
        |     sqrt(n * sppd - (sp_c / 100.0) * (sp_c / 100.0))),
        |    12) AS corr_qty_price,
        |  round((n * sqdd - (sq_c / 100.0) * (sd_c / 100.0)) /
        |    (sqrt(n * sqqd - (sq_c / 100.0) * (sq_c / 100.0)) *
        |     sqrt(n * sddd - (sd_c / 100.0) * (sd_c / 100.0))),
        |    12) AS corr_qty_disc,
        |  round((n * spdd - (sp_c / 100.0) * (sd_c / 100.0)) /
        |    (sqrt(n * sppd - (sp_c / 100.0) * (sp_c / 100.0)) *
        |     sqrt(n * sddd - (sd_c / 100.0) * (sd_c / 100.0))),
        |    12) AS corr_price_disc
        |FROM h ORDER BY l_returnflag""".stripMargin)
}
