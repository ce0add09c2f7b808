package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2.E — window functions (SURVEY.md §2.E, rows win_*).
  *
  * Determinism (SURVEY.md §7.4 P5): every ORDER BY that feeds
  * row_number/ntile/frame navigation carries a unique tiebreaker key.
  * rank/dense_rank/percent_rank/cume_dist are tie-stable (equal inputs
  * get equal outputs), so they may order by the value alone.
  *
  * Scale notes (100 TB): windows here are either partitioned by a
  * high-cardinality key (user-day, custkey, nation×salt) or run over a
  * pre-aggregated input whose cardinality is bounded (days × types),
  * never over the raw fact table with a handful of partitions. Top-k
  * per group is two-phase: partial top-k per salted bucket, then final
  * top-k over the tiny candidate set — no single-nation sort task ever
  * sees more than 1/64th of a nation's customers.
  */
object WindowQueries extends QueryPack {
  import Det._

  def queries: Seq[(String, Q)] = Seq(
    // row_number / rank / dense_rank / ntile(4). Partitioned by
    // (status, year) so partition count grows with the time range
    // rather than pinning the whole table onto 3 status sort tasks.
    "win_ranking" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus",
                year($"o_orderdate").as("yr"), $"o_totalprice")
      val wTies = Window.partitionBy($"o_orderstatus", $"yr")
        .orderBy($"o_totalprice".desc)
      val wUniq = Window.partitionBy($"o_orderstatus", $"yr")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      o.select($"o_orderstatus", $"yr", $"o_orderkey", $"o_totalprice",
          row_number().over(wUniq).cast(LongType).as("rn"),
          rank().over(wTies).cast(LongType).as("rk"),
          dense_rank().over(wTies).cast(LongType).as("drk"),
          ntile(4).over(wUniq).cast(LongType).as("quartile"))
        .orderBy($"o_orderstatus", $"yr", $"rn")
    }),

    // Top-3 spend customers per nation, two-phase (see scale note).
    "win_topk_pergroup" -> ((s, dir) => {
      import s.implicits._
      val spend = Tables.load(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(sum(money($"o_totalprice")).as("spend_d"))
        .join(Tables.load(s, dir, "customer")
                .select($"c_custkey", $"c_nationkey"),
              $"o_custkey" === $"c_custkey")
      val wLocal = Window
        .partitionBy($"c_nationkey", pmod($"c_custkey", lit(64)))
        .orderBy($"spend_d".desc, $"c_custkey")
      val wFinal = Window.partitionBy($"c_nationkey")
        .orderBy($"spend_d".desc, $"c_custkey")
      spend
        .withColumn("lrn", row_number().over(wLocal)).filter($"lrn" <= 3)
        .withColumn("rn", row_number().over(wFinal)).filter($"rn" <= 3)
        .join(broadcast(Tables.load(s, dir, "nation")),
              $"c_nationkey" === $"n_nationkey")
        .select($"n_name", $"c_custkey",
                $"spend_d".cast(DoubleType).as("spend"),
                $"rn".cast(LongType).as("rn"))
        .orderBy($"n_name", $"rn")
    }),

    // lag / lead / percent_rank / cume_dist over the daily event-count
    // series. Window input is the (day × event_type) aggregate — its
    // cardinality is bounded by the calendar, not the fact table.
    "win_analytic" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.load(s, dir, "events")
        .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val wSeq = Window.partitionBy($"event_type").orderBy($"day")
      val wVal = Window.partitionBy($"event_type").orderBy($"n", $"day")
      daily.select($"event_type", $"day", $"n",
          lag($"n", 1).over(wSeq).as("prev_n"),
          lead($"n", 1).over(wSeq).as("next_n"),
          ($"n" - lag($"n", 1).over(wSeq)).as("delta"),
          percent_rank().over(wVal).as("pr"),
          cume_dist().over(wVal).as("cd"))
        .orderBy($"event_type", $"day")
    }),

    // ROWS frames: running total + trailing-7-row moving average over
    // daily revenue. Moving average is computed as exact decimal sum
    // cast to double, divided by the frame row count — both engines do
    // one IEEE division on identical operands.
    "win_frame_rows" -> ((s, dir) => {
      import s.implicits._
      val daily = Tables.load(s, dir, "orders")
        .groupBy(date_trunc("day", $"o_orderdate").as("day"))
        .agg(sum(money($"o_totalprice")).as("rev_d"))
      val w7 = Window.orderBy($"day").rowsBetween(-6, 0)
      val wRun = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.select($"day",
          $"rev_d".cast(DoubleType).as("rev"),
          sum($"rev_d").over(wRun).cast(DoubleType).as("run_rev"),
          (sum($"rev_d").over(w7).cast(DoubleType) /
            count(lit(1)).over(w7)).as("ma7"),
          count(lit(1)).over(w7).as("n7"))
        .orderBy($"day")
    }),

    // RANGE frame: per customer, revenue from their orders priced
    // within 100k below the current order. Partitioned by custkey —
    // high cardinality, no skew.
    "win_frame_range" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice")
        .rangeBetween(-100000, 0)
      Tables.load(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice",
          sum(money($"o_totalprice")).over(w).cast(DoubleType)
            .as("range_rev"),
          count(lit(1)).over(w).as("range_n"))
        .orderBy($"o_custkey", $"o_totalprice", $"o_orderkey")
    }),

    // IGNORE NULLS navigation (r7): carry the last KNOWN-GOOD reading
    // past gaps — error events null their value (nullif synthesis;
    // the fixture has no raw nulls), and last_value(IGNORE NULLS)
    // reaches back over any run of errors. This is ts_locf's window
    // primitive exposed as its own contract row, with lead/lag
    // IGNORE NULLS alongside (navigation functions skip nulls only
    // under the modifier — the default counts them as rows).
    "win_ignore_nulls" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .selectExpr("event_id", "user_id",
          "unix_timestamp(date_trunc('SECOND', ts)) AS tsec",
          "CASE WHEN event_type = 'error' THEN NULL" +
            " ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)" +
            " END AS cents")
        .selectExpr("event_id", "user_id", "cents",
          "last_value(cents) IGNORE NULLS OVER (" +
            "PARTITION BY user_id ORDER BY tsec, event_id" +
            " ROWS UNBOUNDED PRECEDING) AS last_good",
          "lag(cents) IGNORE NULLS OVER (" +
            "PARTITION BY user_id ORDER BY tsec, event_id)" +
            " AS prev_good")
        .orderBy($"event_id")
    }),

    // TIME-typed range frame (r7): the trailing-1-hour rolling window
    // every telemetry dashboard runs, phrased directly on the ordered
    // timestamp with an INTERVAL bound — unlike win_frame_range's
    // numeric range, the frame edge here is calendar arithmetic the
    // engine evaluates per row. ts truncated to seconds (§7.4 P3) so
    // frame membership is identical cross-engine; the sum is an exact
    // decimal fold. Per-user partitions keep frames small and state
    // O(window) regardless of history length.
    "win_time_range" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .selectExpr("event_id", "user_id",
          "date_trunc('SECOND', ts) AS tsec",
          "CAST(value AS DECIMAL(18,2)) AS dv")
        .selectExpr("event_id", "user_id",
          "count(*) OVER (PARTITION BY user_id ORDER BY tsec" +
            " RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)" +
            " AS n_1h",
          "CAST(sum(dv) OVER (PARTITION BY user_id ORDER BY tsec" +
            " RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)" +
            " AS DOUBLE) AS sum_1h")
        .orderBy($"event_id")
    }),

    // first_value / last_value / nth_value over the full user-day
    // frame. events.ts is ns in parquet but µs in Spark (§7.4 P3), so
    // the oracle orders by date_trunc('microseconds', ts) — identical
    // keys on both engines — with event_id as the unique tiebreaker.
    "win_first_last_value" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", date_trunc("day", $"ts"))
        .orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.load(s, dir, "events")
        .select($"user_id", date_trunc("day", $"ts").as("day"), $"event_id",
          first_value($"value").over(w).as("first_v"),
          last_value($"value").over(w).as("last_v"),
          nth_value($"value", 2).over(w).as("second_v"))
        .orderBy($"user_id", $"day", $"event_id")
    }),

    // Batch sessionization — the batch analogue of the streaming
    // session_window (st4): a session breaks at gap >= 30 min,
    // matching session_window's half-open [start, start+gap) windows.
    // lag → gap flag → running sum = session id; then one agg per
    // (user, session). Epoch-second integers throughout (§7.4 P3).
    // Scale: both windows partition by user_id (high cardinality),
    // never by a low-cardinality key; state per task is one row.
    // Thin adapter over graft.api.Events.sessionize (r8).
    "win_sessionize" -> ((s, dir) => {
      import s.implicits._
      graft.api.Events.sessionize(
          Tables.load(s, dir, "events")
            .select($"user_id", $"event_id",
              unix_timestamp(date_trunc("second", $"ts")).as("ts_s")),
          "user_id", "ts_s", "event_id", gapSec = 1800L)
        .orderBy($"user_id", $"sid")
    }),

    // Distribution window functions (r7): percent_rank / cume_dist —
    // the normalized-rank forms used for per-cohort percentile
    // features. Ordering is made UNIQUE by the (acctbal, custkey)
    // tie-break, so both functions are single IEEE divisions of
    // identical integers in both engines (§7.4 determinism).
    // Scale: partitioned by (mktsegment, nationkey) — 5×25 cohorts —
    // never by the bare 5-value segment key, so no sort task holds
    // more than one cohort and partition count grows with the dims.
    // Distribution functions in INTEGER-RATIONAL form (r16; the
    // repo's cross-engine discipline, as text_bm25): the raw ratios
    // round(pct, 12) diverged between engines at the 100x staging —
    // a value landing on the 12th-digit rounding knife-edge (measured
    // absdiff 1e-12 at row 299661) — while the rational numerators
    // are exact. percent_rank ≡ (rank−1)/(n−1) and cume_dist ≡
    // peers_at_or_before/n, so multiplying the built-in's double back
    // by its denominator and rounding recovers the integer exactly:
    // the relative error of one IEEE division is ≤ 2⁻⁵², so the
    // absolute error after the multiply is ≤ n·2⁻⁵² ≪ 0.5 for any
    // partition below 2⁵¹ rows. The plan still exercises the real
    // percent_rank/cume_dist window operators; consumers wanting the
    // double divide num/den.
    "win_distribution" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment", $"c_nationkey")
        .orderBy($"c_acctbal", $"c_custkey")
      val wp = Window.partitionBy($"c_mktsegment", $"c_nationkey")
      Tables.load(s, dir, "customer")
        .select($"c_mktsegment", $"c_nationkey", $"c_custkey",
          $"c_acctbal",
          count(lit(1)).over(wp).as("n_rows"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
        .select($"c_mktsegment", $"c_nationkey", $"c_custkey",
          $"c_acctbal", $"n_rows",
          round($"pr" * ($"n_rows" - 1L)).cast(LongType).as("pct_num"),
          round($"cd" * $"n_rows").cast(LongType).as("cume_num"))
        .orderBy($"c_mktsegment", $"c_nationkey", $"c_custkey")
    })
  )

  def oracle: Seq[(String, String)] = Seq(
    "win_ranking" ->
      """SELECT o_orderstatus, CAST(year(o_orderdate) AS INTEGER) AS yr,
        |  o_orderkey, o_totalprice,
        |  row_number() OVER wu AS rn,
        |  rank() OVER wt AS rk,
        |  dense_rank() OVER wt AS drk,
        |  ntile(4) OVER wu AS quartile
        |FROM orders
        |WINDOW
        |  wt AS (PARTITION BY o_orderstatus, year(o_orderdate)
        |         ORDER BY o_totalprice DESC),
        |  wu AS (PARTITION BY o_orderstatus, year(o_orderdate)
        |         ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderstatus, yr, rn""".stripMargin,

    "win_topk_pergroup" ->
      """WITH spend AS (
        |  SELECT c_nationkey, c_custkey,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_d
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT c_nationkey, c_custkey, spend_d,
        |         row_number() OVER (PARTITION BY c_nationkey
        |                            ORDER BY spend_d DESC, c_custkey) AS rn
        |  FROM spend)
        |SELECT n_name, c_custkey, CAST(spend_d AS DOUBLE) AS spend, rn
        |FROM ranked JOIN nation ON n_nationkey = c_nationkey
        |WHERE rn <= 3
        |ORDER BY n_name, rn""".stripMargin,

    "win_analytic" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n,
        |  lag(n, 1) OVER w AS prev_n,
        |  lead(n, 1) OVER w AS next_n,
        |  n - lag(n, 1) OVER w AS delta,
        |  percent_rank() OVER wv AS pr,
        |  cume_dist() OVER wv AS cd
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day),
        |       wv AS (PARTITION BY event_type ORDER BY n, day)
        |ORDER BY event_type, day""".stripMargin,

    "win_frame_rows" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_d
        |  FROM orders GROUP BY 1)
        |SELECT day,
        |  CAST(rev_d AS DOUBLE) AS rev,
        |  CAST(SUM(rev_d) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS run_rev,
        |  CAST(SUM(rev_d) OVER w7 AS DOUBLE) / COUNT(*) OVER w7 AS ma7,
        |  COUNT(*) OVER w7 AS n7
        |FROM daily
        |WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    "win_frame_range" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS range_rev,
        |  COUNT(*) OVER w AS range_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
        |             RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_totalprice, o_orderkey""".stripMargin,

    "win_first_last_value" ->
      """SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |  event_id,
        |  first_value(value) OVER w AS first_v,
        |  last_value(value) OVER w AS last_v,
        |  nth_value(value, 2) OVER w AS second_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id, date_trunc('day', ts)
        |             ORDER BY date_trunc('microseconds', ts), event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |                      AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, day, event_id""".stripMargin,

    "win_ignore_nulls" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec,
        |    CASE WHEN event_type = 'error' THEN NULL
        |      ELSE CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      END AS cents
        |  FROM events)
        |SELECT event_id, user_id, cents,
        |  last_value(cents IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY tsec, event_id
        |    ROWS UNBOUNDED PRECEDING) AS last_good,
        |  lag(cents IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY tsec, event_id) AS prev_good
        |FROM e ORDER BY event_id""".stripMargin,

    "win_time_range" ->
      """WITH e AS (SELECT event_id, user_id,
        |    date_trunc('second', ts) AS tsec,
        |    CAST(value AS DECIMAL(18,2)) AS dv FROM events)
        |SELECT event_id, user_id,
        |  count(*) OVER (PARTITION BY user_id ORDER BY tsec
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |    AS n_1h,
        |  CAST(sum(dv) OVER (PARTITION BY user_id ORDER BY tsec
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) AS sum_1h
        |FROM e ORDER BY event_id""".stripMargin,

    "win_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |g AS (
        |  SELECT user_id, event_id, ts_s,
        |    CASE WHEN lag(ts_s, 1) OVER w IS NULL
        |           OR ts_s - lag(ts_s, 1) OVER w >= 1800 THEN 1
        |         ELSE 0 END AS gap
        |  FROM t
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)),
        |s AS (
        |  SELECT user_id, event_id, ts_s,
        |    CAST(sum(gap) OVER (PARTITION BY user_id
        |      ORDER BY ts_s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS sid
        |  FROM g)
        |SELECT user_id, sid, count(*) AS n_events,
        |  min(ts_s) AS start_s, max(ts_s) - min(ts_s) AS dur_s
        |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,

    // Same rational recovery (see the query comment): the round-back
    // is exact in both engines, so the compare is integer-exact.
    "win_distribution" ->
      """SELECT c_mktsegment, c_nationkey, c_custkey, c_acctbal,
        |  count(*) OVER wp AS n_rows,
        |  CAST(round(percent_rank() OVER w * (count(*) OVER wp - 1))
        |       AS BIGINT) AS pct_num,
        |  CAST(round(cume_dist() OVER w * count(*) OVER wp)
        |       AS BIGINT) AS cume_num
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment, c_nationkey
        |             ORDER BY c_acctbal, c_custkey),
        |  wp AS (PARTITION BY c_mktsegment, c_nationkey)
        |ORDER BY c_mktsegment, c_nationkey, c_custkey""".stripMargin
  )
}
