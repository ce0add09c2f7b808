package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sensor time-series operators (SURVEY.md §2.N) — the reference's own
  * domain is a sensor-event stream, and these are the four
  * batch-analytics ops every telemetry pipeline runs: regular
  * resampling with gap filling, last-observation-carried-forward,
  * rolling-window anomaly flagging, and per-sensor normalization.
  *
  * Determinism (§7.4): `events.ts` is ns-precision, so every use goes
  * through `date_trunc('second')` first (P3); window ORDER BYs carry
  * the unique `event_id` tiebreaker (P5); rolling statistics are
  * exact-decimal sums compared multiplicatively — no decimal division
  * whose scale rules could differ across engines.
  *
  * Scale design (100 TB):
  * - `ts_resample` aggregates to (type, bin) first — the gap-fill grid
  *   is bins × types (tiny) built from one global bound row, joined
  *   LEFT against the reduced aggregate, never against raw events.
  * - `ts_locf` / `ts_anomaly` partition their windows by user/sensor
  *   id (high cardinality), so frames stay small and parallel; nothing
  *   windows over a constant key.
  * - `ts_norm` needs per-type extrema: a 5-row aggregate broadcast
  *   back, not a window over the raw table.
  */
object SensorQueries extends QueryPack {

  /** Seconds since epoch of the second-truncated event time. */
  private def sec(c: org.apache.spark.sql.Column) =
    unix_timestamp(date_trunc("second", c))

  def queries: Seq[(String, Q)] = Seq(
    // Resample to a regular 15-minute grid per event type, filling
    // empty bins with zero — the plot/join-ready shape of a raw
    // event stream.
    // Thin adapter over graft.api.TimeSeries.resample (r8).
    "ts_resample" -> ((s, dir) => {
      import s.implicits._
      graft.api.TimeSeries.resample(
          Tables.load(s, dir, "events").withColumn("sec", sec($"ts")),
          "event_type", "sec", "value", binSec = 900L)
        .withColumnRenamed("series", "event_type")
        .orderBy($"event_type", $"bin")
    }),

    // Last-observation-carried-forward: at every event, the value of
    // the user's latest purchase at-or-before it (NULL until the first
    // purchase) — the standard sparse-sensor densification.
    // Thin adapter over graft.api.TimeSeries.locf (r8).
    "ts_locf" -> ((s, dir) => {
      import s.implicits._
      graft.api.TimeSeries.locf(
          Tables.load(s, dir, "events").withColumn("sec", sec($"ts")),
          "user_id", "sec", "event_id", "value",
          isObservation = $"event_type" === "purchase")
        .select($"event_id", $"user_id", $"event_type", $"value",
                $"filled")
        .orderBy($"event_id")
    }),

    // Linear interpolation between observed points (LOCF's smoother
    // sibling): per user, 'purchase' rows are the observations; every
    // row gets prev + (next-prev) * (t-tp)/(tn-tp), falling back to
    // the single available neighbor at the edges. Determinism: t is
    // integer epoch-seconds, and the interpolation is ONE fixed IEEE
    // expression tree evaluated on bit-identical operands in both
    // engines (each *, /, +- is exactly rounded, so identical operand
    // order => identical doubles — same argument as ts_norm). Both
    // forward and backward scans are frame-bounded running windows
    // (no whole-partition buffering), partitioned on user_id.
    "ts_interpolate" -> ((s, dir) => {
      import s.implicits._
      val wPrev = Window.partitionBy($"user_id")
        .orderBy(sec($"ts"), $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy($"user_id")
        .orderBy(sec($"ts"), $"event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Tables.load(s, dir, "events")
        .withColumn("t", sec($"ts"))
        .withColumn("obs",
          when($"event_type" === "purchase", $"value"))
        .withColumn("obs_t", when($"obs".isNotNull, $"t"))
        .withColumn("pv", last($"obs", ignoreNulls = true).over(wPrev))
        .withColumn("pt", last($"obs_t", ignoreNulls = true).over(wPrev))
        .withColumn("nv", first($"obs", ignoreNulls = true).over(wNext))
        .withColumn("nt", first($"obs_t", ignoreNulls = true).over(wNext))
        .withColumn("interp",
          when($"pt".isNotNull && $"nt".isNotNull && $"nt" =!= $"pt",
            $"pv" + ($"nv" - $"pv") * (($"t" - $"pt") / ($"nt" - $"pt")))
          .when($"pt".isNotNull, $"pv")
          .otherwise($"nv"))
        .select($"event_id", $"user_id", $"event_type", $"value",
                $"interp")
        .orderBy($"event_id")
    }),

    // Rolling anomaly flag: value exceeds 2× the trailing-20-row mean
    // for that user. Compared multiplicatively over exact decimals
    // (value·n > 2·sum), so no float accumulation or decimal division.
    // Thin adapter over graft.api.TimeSeries.rollingSpike (r8).
    "ts_anomaly" -> ((s, dir) => {
      import s.implicits._
      graft.api.TimeSeries.rollingSpike(
          Tables.load(s, dir, "events").withColumn("sec", sec($"ts")),
          "user_id", "sec", "event_id", "value",
          lookback = 20, factor = 2)
        .select($"event_id", $"user_id", $"value",
          $"wsum".cast(DoubleType).as("wsum"), $"wn", $"spike")
        .orderBy($"event_id")
    }),

    // Reading-gap detection: seconds since the user's previous event
    // (NULL for the first) and a flag for gaps over 2 hours — the
    // sensor-health check (dead sensor / dropped uplink) every
    // telemetry pipeline monitors.
    "ts_gaps" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy(sec($"ts"), $"event_id")
      Tables.load(s, dir, "events")
        .withColumn("gap_sec", sec($"ts") - lag(sec($"ts"), 1).over(w))
        .select($"event_id", $"user_id", $"gap_sec",
          ($"gap_sec" > 7200L).as("is_gap"))
        .orderBy($"event_id")
    }),

    // Discrete derivative per sensor type (r8): rate of change between
    // consecutive readings — the canonical sensor op (flow from
    // volume, power from energy). One lag window per type; numerator
    // and denominator stay exact integers (cents, seconds) and the
    // division is the single final IEEE step (ts_ewma's discipline).
    // Same-second pairs are emitted with a NULL rate (denominator 0 is
    // undefined, not infinite); order key (sec, event_id) is
    // collision-free.
    // Thin adapter over graft.api.TimeSeries.rate (r8).
    "ts_rate" -> ((s, dir) => {
      import s.implicits._
      graft.api.TimeSeries.rate(
          Tables.load(s, dir, "events").withColumn("sec", sec($"ts")),
          "event_type", "sec", "event_id",
          valueScaled =
            expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .select($"event_id", $"event_type", $"delta_v".as("delta_c"),
          $"delta_s", $"rate")
        .orderBy($"event_id")
    }),

    // Adjacent-sequence pattern match (r8): the MATCH_RECOGNIZE-style
    // op funnel_steps does NOT cover — funnel finds the first
    // *reachable* chain anywhere in a user's history, this finds
    // view→click→purchase as three CONSECUTIVE events in the user's
    // ordered stream. Two leads over one (user, time, id) window —
    // a single shuffle on the high-cardinality user key, no
    // self-joins; the pattern predicate evaluates map-side after the
    // sort, so the op scales as one window pass at any history depth.
    // Order key (sec, event_id) is collision-free (event_id unique).
    "win_seqpattern" -> ((s, dir) => {
      import s.implicits._
      // Thin adapter over graft.api.Events.seqPattern (r8), which
      // generalizes to any pattern length via k−1 leads in one window.
      graft.api.Events.seqPattern(
          Tables.load(s, dir, "events")
            .select($"user_id", $"event_type", sec($"ts").as("sec"),
              $"event_id"),
          "user_id", "event_type", "sec", "event_id",
          Seq("view", "click", "purchase"))
        .orderBy($"user_id")
    }),

    // Ordered-funnel analysis: per user, the first view, the first
    // click strictly after that view, and the first purchase strictly
    // after that click — the event-sequence op behind conversion
    // metrics. Three chained per-user aggregates (each a shuffle on
    // the high-cardinality user key); no window over raw history.
    "funnel_steps" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type", sec($"ts").as("sec"))
      val t1 = e.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"sec").as("t_view"))
      val t2 = e.filter($"event_type" === "click")
        .join(t1, "user_id")
        .filter($"sec" > $"t_view")
        .groupBy($"user_id", $"t_view").agg(min($"sec").as("t_click"))
      val t3 = e.filter($"event_type" === "purchase")
        .join(t2, "user_id")
        .filter($"sec" > $"t_click")
        .groupBy($"user_id", $"t_view", $"t_click")
        .agg(min($"sec").as("t_purchase"))
      t1.join(t2.select($"user_id", $"t_click"), Seq("user_id"), "left")
        .join(t3.select($"user_id", $"t_purchase"), Seq("user_id"), "left")
        .select($"user_id", $"t_view", $"t_click", $"t_purchase",
                $"t_purchase".isNotNull.as("converted"))
        .orderBy($"user_id")
    }),

    // Event-path n-grams (r11d) — the path-analysis rollup behind
    // every Sankey/flow view: the top-10 3-step event sequences
    // across all user histories. Two leads over one (user, time, id)
    // window — a single shuffle on the high-cardinality user key,
    // pattern assembly map-side (win_seqpattern's plan shape, lifted
    // from one fixed pattern to the full pattern DISTRIBUTION); the
    // pattern space is |event types|³ ≤ 125, so the aggregate is
    // state-sized and the top-10 is a TakeOrdered under the total
    // (n DESC, path) order.
    "agg_path_ngrams" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"tus", $"event_id")
      Tables.load(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type",
          expr("unix_micros(ts)").as("tus"))
        .withColumn("e2", lead($"event_type", 1).over(w))
        .withColumn("e3", lead($"event_type", 2).over(w))
        .filter($"e3".isNotNull)
        .select(concat_ws(">", $"event_type", $"e2", $"e3").as("path"),
          $"user_id")
        .groupBy($"path")
        .agg(count(lit(1)).as("n"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"n".desc, $"path").limit(10)
    }),

    // Two-proportion A/B significance (r11d): the experiment-readout
    // op. Variants from a deterministic user-id split; conversion =
    // the user's FIRST event is a purchase (any-purchase-ever
    // saturates at ~100% on this dense fixture — pooled variance 0,
    // z undefined; first-event conversion sits near 1/|event types|,
    // keeping the statistic live at every SF). Counts reduce to 4
    // BIGINTs (n, conv per arm), and the z-score is ONE fixed IEEE
    // expression over them — subtraction, multiplication, division
    // and sqrt are all correctly rounded, so the statistic itself
    // hash-matches byte-identically (the agg_regression discipline
    // applied to inference). Rates in exact integer ppm.
    "agg_ab_test" -> ((s, dir) => {
      import s.implicits._
      val u = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type",
          expr("unix_micros(ts)").as("tus"), $"event_id")
        .groupBy($"user_id")
        .agg(min_by($"event_type", struct($"tus", $"event_id"))
          .as("first_type"))
        .select($"user_id",
          when($"first_type" === "purchase", 1L).otherwise(0L)
            .as("conv"))
        .withColumn("variant", pmod($"user_id", lit(2L)))
      u.groupBy($"variant")
        .agg(count(lit(1)).as("n"), sum($"conv").as("c"))
        .agg(
          sum(when($"variant" === 0, $"n")).as("n_a"),
          sum(when($"variant" === 0, $"c")).as("c_a"),
          sum(when($"variant" === 1, $"n")).as("n_b"),
          sum(when($"variant" === 1, $"c")).as("c_b"))
        .selectExpr("n_a", "c_a", "n_b", "c_b",
          "c_a * 1000000 div n_a AS rate_a_ppm",
          "c_b * 1000000 div n_b AS rate_b_ppm",
          // Degenerate-pooled-rate loud guard (r11 ADVICE): at pooled
          // conversion 0 or 1 the pooled variance is 0 and z divides
          // by zero — Spark would emit NaN/Inf where DuckDB's float
          // division differs, a silent hash divergence. Both engines
          // raise instead (oracle mirrors with error()).
          "CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN" +
            " raise_error('agg_ab_test: degenerate pooled rate" +
            " (all or none convert) — z undefined') ELSE" +
            " round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)" +
            " / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))" +
            " * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))" +
            " * (1.0 / n_a + 1.0 / n_b)), 6) END AS z_score")
    }),

    // Cohort retention matrix (r11d) — the canonical product-
    // analytics rollup: users grouped by SIGNUP day, distinct-active
    // counted per (cohort, day offset). Cohort and activity days are
    // integer epoch_us div 86400e6 (never engine date functions —
    // ts_seasonality's adjudication); pre-signup activity is excluded
    // by the offset >= 0 filter (retention counts activity SINCE
    // signup); ret_ppm is exact-integer against the offset-0 cohort
    // size. Scale shape: one user-keyed shuffle builds both the
    // cohort relation and the distinct (user, day) activity relation,
    // then everything aggregates to |cohorts|x|offsets| rows; the
    // matrix is state-sized, never event-sized.
    "agg_cohort_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type",
          expr("unix_micros(ts) div 86400000000").as("day"))
      val cohort = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"day").as("cd"))
      val act = ev.select($"user_id", $"day").distinct()
      val cells = act.join(cohort, "user_id")
        .filter($"day" >= $"cd")
        .select($"cd", ($"day" - $"cd").as("offset"), $"user_id")
        .groupBy($"cd", $"offset")
        .agg(countDistinct($"user_id").as("n_users"))
      val size = cells.filter($"offset" === 0)
        .select($"cd", $"n_users".as("cohort_n"))
      cells.join(size, "cd")
        .select($"cd", $"offset", $"n_users", $"cohort_n",
          expr("n_users * 1000000 div cohort_n").as("ret_ppm"))
        .orderBy($"cd", $"offset")
    }),

    // Time-BOUNDED conversion funnel (r11d): funnel_steps with
    // conversion windows — a click only counts within 48 h of the
    // user's first view, a purchase within 48 h of that click (the
    // attribution-window semantics real funnels carry; the unbounded
    // form overstates conversion by attributing a purchase weeks
    // later). Same chained per-user min-aggregate shape as
    // funnel_steps — never a raw-history window — with the window
    // bound as a join predicate; gaps stay exact integer
    // microseconds. Output is the 1-row stage summary with exact gap
    // mass (the per-user relation is funnel_steps' surface).
    "funnel_window" -> ((s, dir) => {
      import s.implicits._
      val W = 172800000000L // 48 h in us
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type",
          expr("unix_micros(ts)").as("tus"))
      val v = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"tus").as("vt"))
      val c = ev.filter($"event_type" === "click").join(v, "user_id")
        .filter($"tus" > $"vt" && $"tus" <= $"vt" + W)
        .groupBy($"user_id", $"vt").agg(min($"tus").as("ct"))
      val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"tus" > $"ct" && $"tus" <= $"ct" + W)
        .groupBy($"user_id", $"ct").agg(min($"tus").as("pt"))
      val nv = v.agg(count(lit(1)).as("n_view"))
      val nc = c.agg(count(lit(1)).as("n_click"),
        sum($"ct" - $"vt").as("click_gap_us"))
      val np = p.agg(count(lit(1)).as("n_purchase"),
        sum($"pt" - $"ct").as("purchase_gap_us"))
      nv.crossJoin(nc).crossJoin(np)
        .select($"n_view", $"n_click", $"n_purchase",
          $"click_gap_us", $"purchase_gap_us",
          expr("n_click * 1000000 div n_view").as("view_click_ppm"),
          expr("n_purchase * 1000000 div n_click").as("click_purch_ppm"))
    }),

    // Per-type min-max normalization: extrema are an order-free 5-row
    // aggregate broadcast back onto the stream; the normalized value
    // is a single IEEE (value−min)/(max−min) — bit-identical
    // cross-engine.
    // Gaps-and-islands streak detection: longest run of CONSECUTIVE
    // purchase days per user (retention/engagement's canonical
    // metric). The island id is day − row_number — constant within a
    // consecutive run, strictly shifted across a gap — so streaks
    // fall out of two stacked integer aggregates; the day relation is
    // distinct-reduced before any window (≤ one row per user-day at
    // any scale). All integers, exact oracle.
    "win_streak" -> ((s, dir) => {
      import s.implicits._
      val days = Tables.load(s, dir, "events")
        .filter($"event_type" === "purchase")
        .selectExpr("user_id",
          // nonNeg guard (r8): `div` truncates, the oracle's `//`
          // floors — equal only for post-1970 timestamps, and the
          // divergence would surface as a silent hash mismatch.
          Det.nonNegExpr("unix_timestamp(date_trunc('DAY', ts))",
            "win_streak epoch") + " div 86400 AS day")
        .distinct()
      days
        .withColumn("island", $"day" - row_number().over(
          Window.partitionBy($"user_id").orderBy($"day")))
        .groupBy($"user_id", $"island")
        .agg(count(lit(1)).as("len"))
        .groupBy($"user_id")
        .agg(sum($"len").as("n_days"), count(lit(1)).as("n_streaks"),
          max($"len").as("max_streak"))
        .orderBy($"user_id")
    }),

    // Series downsampling: one representative per (user, 6-hour
    // bucket) — the point FARTHEST from its bucket mean (the
    // shape-preserving pick; an LTTB-family criterion made exactly
    // deterministic by comparing |cents·n − Σcents| — the mean
    // inequality multiplied through by n, so no division ever
    // happens). Per-bucket windows partition on the high-cardinality
    // (user, bucket) key; ties break on event_id (§7.4 P5).
    "ts_downsample" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .selectExpr("user_id", "event_id", "value",
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
          Det.nonNegExpr("unix_timestamp(date_trunc('SECOND', ts))",
            "ts_downsample epoch") + " div 21600 AS bucket")
      val wb = Window.partitionBy($"user_id", $"bucket")
      e.withColumn("n", count(lit(1)).over(wb))
        .withColumn("sumc", sum($"cents").over(wb))
        .withColumn("crit", abs($"cents" * $"n" - $"sumc"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"user_id", $"bucket")
            .orderBy($"crit".desc, $"event_id")))
        .filter($"rn" === 1)
        .select($"user_id", $"bucket", $"event_id", $"value",
          $"n".as("n_in_bucket"))
        .orderBy($"user_id", $"bucket")
    }),

    // OHLC candles (r7): open/high/low/close per (type, day) — the
    // canonical downsample for any numeric series (finance named it,
    // telemetry dashboards run it). High/low are plain extrema;
    // open/close ride min_by/max_by on the UNIQUE (tsec, event_id)
    // composite (tsec·10^9 + id — exact BIGINT, 2024-era tsec·10^9 ≈
    // 1.7e18 < 2^63), so ties at the same second cannot make the
    // candle nondeterministic. event_id is loud-guarded < 10^9 (r8,
    // advisor item 2): beyond the radix the composite silently
    // collides, and 10^9 leaves headroom for the ScaleBench replica
    // offsets (max ~10^8). ONE two-phase aggregate — no window, no
    // self-join, shuffle width = days×types.
    "ts_ohlc" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .selectExpr("event_type",
          Det.nonNegExpr("unix_timestamp(date_trunc('DAY', ts))",
            "ts_ohlc epoch") + " div 86400 AS day",
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
          "unix_timestamp(date_trunc('SECOND', ts)) * 1000000000 + " +
            Det.boundedExpr("event_id", 1000000000L, "ts_ohlc event_id") +
            " AS seq")
        .groupBy($"event_type", $"day")
        .agg(expr("min_by(cents, seq)").as("open_c"),
          max($"cents").as("high_c"), min($"cents").as("low_c"),
          expr("max_by(cents, seq)").as("close_c"),
          count(lit(1)).as("n"))
        .orderBy($"event_type", $"day")
    }),

    // CUSUM drift detection (Page 1954): the classic reset-on-alarm
    // recursion is NOT expressible in a window — but the equivalent
    // one-sided form is: S_i = cumsum(x − target), and the statistic
    // is S_i − min(S_0..S_i), which exceeds threshold h exactly when
    // the reset form alarms. Both running aggregates are per-user
    // frames with O(1) state; everything is exact integer cents
    // (target = the user's own overall mean, cleared of its division
    // by comparing n·x − Σx style: here target is a fixed 5000-cent
    // reference so the statistic stays a plain BIGINT).
    "ts_cusum" -> ((s, dir) => {
      import s.implicits._
      val target = 5000L // fixed reference level, cents
      val h = 50000L     // alarm threshold, cents
      val w = Window.partitionBy($"user_id")
        .orderBy($"tsec", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .filter($"event_type" === "purchase")
        .selectExpr("user_id", "event_id",
          "unix_timestamp(date_trunc('SECOND', ts)) AS tsec",
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
        .withColumn("cum", sum($"cents" - target).over(w))
        // S_i = cum_i − min(cum_0..cum_i) with the VIRTUAL cum_0 = 0
        // (least(0, …)): without it the first rows overstate the
        // reset-form statistic — caught by the recursion-replay law.
        .withColumn("stat",
          $"cum" - least(lit(0L), min($"cum").over(w)))
        .select($"user_id", $"event_id", $"cents", $"stat",
          ($"stat" > h).as("alarm"))
        .orderBy($"user_id", $"tsec", $"event_id")
    }),

    // Day-of-week seasonal profile per event type, with the peak day
    // flagged. The dow is computed engine-independently as
    // (epoch_days + 4) % 7 (1970-01-01 was a Thursday; 0 = Sunday) —
    // NEVER the engines' dayofweek(), whose numbering conventions
    // differ (Spark 1=Sunday, DuckDB 0=Sunday). The per-dow average
    // is one IEEE division of identical exact integers, so the peak
    // ranking (avg desc, dow asc) is deterministic cross-engine.
    "ts_seasonality" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .selectExpr("event_type",
          "(unix_timestamp(date_trunc('DAY', ts)) div 86400 + 4) % 7" +
            " AS dow",
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
        .groupBy($"event_type", $"dow")
        .agg(count(lit(1)).as("n"), sum($"cents").as("sum_c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"event_type")
            .orderBy(($"sum_c" / $"n").desc, $"dow")))
        .selectExpr("event_type", "dow", "n",
          "round(sum_c / n / 100.0, 12) AS avg_v", "rk = 1 AS is_peak")
        .orderBy($"event_type", $"dow")
    }),

    // End-to-end sensor pipeline composition (r8, verdict item 8) —
    // the sensor-domain twin of pipeline_corpus: raw CSV sensor lines
    // (with a deterministic corruption every 13th line) → LineParser
    // ingest+validate (the SAME parser the streaming pipeline runs) →
    // 15-minute resample with zero-filled gaps → rolling anomaly flag
    // on the REDUCED series → OHLC daily publish. One oracled key
    // proving the §2.N stages compose.
    //
    // Scale design: the parse is a map-side projection
    // (to_csv/from_csv round-trip, both codegen'd); everything after
    // the first groupBy runs on the (type, bin) series — thousands of
    // rows per year regardless of raw volume — so the 5-partition
    // anomaly window is over the reduced series, never raw events
    // (same argument as ts_lagcorr). Cents stay exact BIGINTs; the
    // only window-order key is the unique integer bin.
    "pipeline_sensor" -> ((s, dir) => {
      import s.implicits._
      import scala.jdk.CollectionConverters._
      val csvOpts = Map("timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSS")
      // Stage 1 — ingest: render raw CSV lines (every 13th corrupted,
      // keyed on event_id so the oracle reproduces the split), parse +
      // validate through LineParser. The .SSS ms-truncation is
      // harmless: every downstream time derivation is second-level.
      // The fixture stages events as one parquet file, so the scan is
      // one partition — and from_csv (interpreted UnivocityParser, the
      // honest cost of CSV ingest) would run single-threaded at
      // ~2.5 µs/row. A round-robin repartition of the raw lines before
      // the parse spreads it across the session's cores; at 100 TB the
      // ingest arrives as many files and this becomes a no-op, but the
      // principle stands: never let a text-parse stage inherit the
      // file layout's parallelism.
      val lines = Tables.load(s, dir, "events")
        .repartition(s.sparkContext.defaultParallelism)
        .select(when($"event_id" % 13 === 0,
            concat(lit("corrupt line #"), $"event_id"))
          .otherwise(to_csv(struct($"event_id", $"ts", $"user_id",
            $"event_type", $"value", $"props"), csvOpts.asJava))
          .as("value"))
      // Materialize the parsed (bronze→silver) relation BEFORE the
      // validity filter. Left declarative, PushPredicateThroughNonJoin
      // substitutes the `from_csv` expression into every conjunct of
      // isValid, and CsvToStructs is codegen-fallback so no CSE
      // rescues it — each row was parsed ~7 times (measured 4.6 s vs
      // 1.3 s at sf0.1; PLANS.md r8). The barrier parses once per
      // row; at 100 TB this IS the staged typed table a real ingest
      // writes between parse and validation.
      val valid = graft.streaming.LineParser.parse(lines)
        .localCheckpoint(true)
        .filter(graft.streaming.LineParser.isValid)
      // Stage 2 — resample to the zero-filled 15-minute grid per type.
      val e = valid.selectExpr("event_type",
        Det.nonNegExpr("unix_timestamp(date_trunc('SECOND', ts))",
          "pipeline_sensor epoch") + " div 900 AS bin",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      // The reduced (type, bin) relation feeds three consumers (the
      // series join, the global grid bounds, the type list). Left
      // declarative, column pruning rewrites each subtree differently
      // so ReusedExchange never fires and the expensive parse scan
      // runs three times (measured 3.5 s at sf0.1). Materializing the
      // ~thousands-of-rows reduction once per invocation is the same
      // move a 100-TB pipeline makes — write the reduced series, then
      // derive grid/bounds from the table, never re-scan the corpus.
      val agg = e.groupBy($"event_type", $"bin")
        .agg(count(lit(1)).as("n"), sum($"cents").as("sum_c"))
        .localCheckpoint(true)
      val grid = agg.agg(min($"bin").as("lo"), max($"bin").as("hi"))
        .select(explode(sequence($"lo", $"hi")).as("bin"))
        .crossJoin(agg.select($"event_type").distinct())
      val series = grid.join(agg, Seq("event_type", "bin"), "left")
        .select($"event_type", $"bin",
          coalesce($"n", lit(0L)).as("n"),
          coalesce($"sum_c", lit(0L)).as("sum_c"))
      // Stage 3 — rolling anomaly on the reduced series: bin total
      // exceeds 2x the trailing-8-bin mean, compared multiplicatively
      // over exact integers (ts_anomaly's discipline).
      val w = Window.partitionBy($"event_type").orderBy($"bin")
        .rowsBetween(-7, Window.currentRow)
      val flagged = series
        .withColumn("wsum", sum($"sum_c").over(w))
        .withColumn("wn", count(lit(1)).over(w))
        .withColumn("anom", $"sum_c" * $"wn" > $"wsum" * 2)
      // Stage 4 — publish: daily OHLC candles of the binned series
      // plus the anomalous-bin count. bin is unique per group, so
      // min_by/max_by are deterministic without a composite.
      flagged
        .selectExpr("*",
          Det.nonNegExpr("bin * 900", "pipeline_sensor binsec") +
            " div 86400 AS day")
        .groupBy($"event_type", $"day")
        .agg(expr("min_by(sum_c, bin)").as("open_c"),
          max($"sum_c").as("high_c"), min($"sum_c").as("low_c"),
          expr("max_by(sum_c, bin)").as("close_c"),
          count(lit(1)).as("n_bins"),
          sum(when($"anom", 1L).otherwise(0L)).as("n_anom"))
        .orderBy($"event_type", $"day")
    }),

    "ts_norm" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val ext = e.groupBy($"event_type")
        .agg(min($"value").as("vmin"), max($"value").as("vmax"))
      e.join(broadcast(ext), "event_type")
        .select($"event_id", $"event_type", $"value",
          (($"value" - $"vmin") / ($"vmax" - $"vmin")).as("norm"))
        .orderBy($"event_id")
    }),

    // Exponentially-weighted moving average (r7) with alpha = 1/2 over
    // the last up-to-16 observations per user. The geometric weights
    // are exact powers of two, so the weighted sum over cent-scaled
    // values is a BIGINT — the only IEEE step is ONE final division of
    // two identical integers, which both engines round identically
    // (the same trick that makes sketch_kmv's estimate oracle-able).
    // The truncated tail (weight < 2^-16 ignored) is the standard
    // streaming approximation; 16 taps ≈ 1e-5 relative truncation.
    // Scale: one window per high-cardinality user_id, 16 lag reads
    // per row inside a single Window node — no extra shuffle beyond
    // the per-user sort, frames never grow with history length.
    "ts_ewma" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy(sec($"ts"), $"event_id")
      val e = Tables.load(s, dir, "events")
        .withColumn("cents",
          (Det.money($"value") * 100).cast(LongType))
      val taps = (0 to 15).map { j =>
        val v = if (j == 0) $"cents" else lag($"cents", j).over(w)
        val pw = lit(1L << (15 - j))
        (coalesce(v, lit(0L)) * pw,
          when(v.isNotNull, pw).otherwise(lit(0L)))
      }
      e.select($"event_id", $"user_id", $"value",
          taps.map(_._1).reduce(_ + _).as("wsum"),
          taps.map(_._2).reduce(_ + _).as("wnorm"))
        .select($"event_id", $"user_id", $"value",
          ($"wsum".cast(DoubleType) / $"wnorm".cast(DoubleType) / 100.0)
            .as("ewma"))
        .orderBy($"event_id")
    }),

    // Lagged cross-correlation (r7) between the click and purchase
    // per-15-minute-bin series at lags 0/1/2 bins — the "does activity
    // now predict conversions later" telemetry question. Both series
    // reduce to (bin, cents) BIGINT aggregates FIRST (the 100-TB move:
    // the lag join runs over thousands of bins, never raw events);
    // Pearson r comes from exact integer power sums via the same fixed
    // IEEE formula text as agg_regression, so it hash-matches.
    "ts_lagcorr" -> ((s, dir) => {
      import s.implicits._
      def series(t: String) = Tables.load(s, dir, "events")
        .filter($"event_type" === t)
        .withColumn("bin", floor(sec($"ts") / 900L))
        .groupBy($"bin")
        .agg(sum(Det.money($"value")).as("d"))
        .select($"bin", Det.centsLong($"d", 100, "c"))
      val x = series("click").select($"bin", $"c".as("xc"))
      val y = series("purchase").select($"bin".as("ybin"), $"c".as("yc"))
      val lags = s.range(0, 3).select($"id".as("lag"))
      x.crossJoin(broadcast(lags))
        .join(y, $"ybin" === $"bin" + $"lag")
        .groupBy($"lag")
        .agg(count(lit(1)).as("n_bins"),
          sum($"xc").as("sx"), sum($"yc").as("sy"),
          sum($"xc" * $"xc").as("sxx"), sum($"yc" * $"yc").as("syy"),
          sum($"xc" * $"yc").as("sxy"))
        .select($"lag", $"n_bins",
          round(($"n_bins" * ($"sxy" / 10000.0) -
              ($"sx" / 100.0) * ($"sy" / 100.0)) /
            sqrt(($"n_bins" * ($"sxx" / 10000.0) -
                ($"sx" / 100.0) * ($"sx" / 100.0)) *
              ($"n_bins" * ($"syy" / 10000.0) -
                ($"sy" / 100.0) * ($"sy" / 100.0))), 12).as("corr"))
        .orderBy($"lag")
    }),

    // Robust outlier detection (r11c): median/MAD instead of
    // ts_anomaly's rolling mean — the estimator that survives the
    // contaminated sensors it is hunting (one stuck-at-9999 reading
    // shifts a mean-based gate; the median ignores it). Everything is
    // EXACT INTEGER: the discrete (lower) median of cents is the
    // rank-(n+1)÷2 value per user — bit-identical to DuckDB's
    // percentile_disc(0.5), no interpolation (Spark's native
    // percentile/median interpolate and could never hash-match) —
    // and the MAD is the same selection over |cents − med|. The flag
    // is the standard 3σ-equivalent gate |x−med| > 3·1.4826·MAD kept
    // in integers as dev·10000 > mad·44478 (MAD=0 degenerates to
    // "any deviation flags", the documented convention). Three
    // user-keyed passes — the two median selections reuse the same
    // hash partitioning; no global structure anywhere.
    // Thin adapter over graft.api.TimeSeries.madOutliers — the DuckDB
    // oracle proves the API function.
    // Rolling exact median (r11d) — the windowed twin of
    // ts_outlier_mad: a trailing-20 robust smoother per user (the
    // filter a spiky sensor needs where a rolling MEAN chases every
    // spike). Exactness discipline: the frame is collected (O(20)
    // state — a DECLARED frame bound, never history-sized), sorted,
    // and the lower median selected by rank (n+1) div 2 — integer
    // cents, value-identical to DuckDB's list_sort pick; never an
    // interpolating percentile. At scale this is one user-keyed
    // window pass with constant per-row state.
    "ts_rolling_median" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"user_id", $"event_id",
          expr("unix_micros(ts)").as("tus"),
          Det.centsLong(Det.money($"value"), 100, "cents"))
      graft.api.TimeSeries
        .rollingMedian(e, "user_id", "tus", "event_id", "cents")
        .select($"event_id", $"user_id", $"cents", $"n_window",
          $"roll_med")
        .orderBy($"event_id")
    }),

    // Exact DAU / WAU / MAU (r11d) — the sliding-distinct rollup
    // every analytics warehouse serves. The corpus reduces ONCE to
    // the distinct (user, day) activity relation; each activity row
    // then contributes to its ≤7 (resp. ≤30) trailing target days by
    // an integer sequence-explode — bounded fanout into an equi-join
    // aggregate, the interval-bucket pattern, never a range
    // nested-loop over raw events. Observed-days join keeps the
    // output to real days. At larger windows the same rollup runs on
    // per-day bitmap states (sketch_bitmap_ops' or-merge); this is
    // the exact form those states must reproduce.
    "agg_active_users" -> ((s, dir) => {
      import s.implicits._
      val act = Tables.load(s, dir, "events")
        .select($"user_id",
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val days = act.select($"day").distinct()
      val dau = act.groupBy($"day")
        .agg(countDistinct($"user_id").as("dau"))
      def windowed(n: Int, nm: String) = act
        .select($"user_id",
          explode(expr(s"sequence(day, day + ${n - 1})")).as("d"))
        .join(days.select($"day".as("d")), "d")
        .groupBy($"d").agg(countDistinct($"user_id").as(nm))
        .withColumnRenamed("d", "day")
      dau.join(windowed(7, "wau"), "day")
        .join(windowed(30, "mau"), "day")
        .orderBy($"day")
    }),

    "ts_outlier_mad" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id",
          Det.centsLong(Det.money($"value"), 100, "cents"))
      graft.api.TimeSeries.madOutliers(e, "user_id", "event_id", $"cents")
        .select($"event_id", $"user_id", $"cents", $"med_c", $"mad_c",
          $"robust_z_pm", $"outlier")
        .orderBy($"event_id")
    }))

  /** The 16 EWMA taps, generated once and shared by both engines'
    * query text so the term order / weight constants cannot drift. */
  private def ewmaTap(j: Int): (String, Long) =
    (if (j == 0) "cents" else s"lag(cents, $j) OVER w", 1L << (15 - j))

  private val ewmaSum: String = (0 to 15).map { j =>
    val (v, pw) = ewmaTap(j); s"COALESCE($v, 0) * $pw"
  }.mkString(" + ")

  private val ewmaNorm: String = (0 to 15).map { j =>
    val (v, pw) = ewmaTap(j)
    s"CASE WHEN $v IS NOT NULL THEN $pw ELSE 0 END"
  }.mkString(" + ")

  def oracle: Seq[(String, String)] = Seq(
    "ts_rolling_median" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM events),
        |f AS (SELECT event_id, user_id, cents,
        |    list_sort(list(cents) OVER (PARTITION BY user_id
        |      ORDER BY tus, event_id
        |      ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM e)
        |SELECT event_id, user_id, cents,
        |  CAST(len(arr) AS BIGINT) AS n_window,
        |  arr[(len(arr) + 1) // 2] AS roll_med
        |FROM f ORDER BY event_id""".stripMargin,

    "agg_active_users" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |days AS (SELECT DISTINCT day FROM act),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM act
        |  GROUP BY day),
        |w7 AS (SELECT d AS day, count(DISTINCT user_id) AS wau FROM (
        |    SELECT user_id, unnest(range(day, day + 7)) AS d FROM act)
        |  JOIN days ON d = days.day GROUP BY d),
        |w30 AS (SELECT d AS day, count(DISTINCT user_id) AS mau FROM (
        |    SELECT user_id, unnest(range(day, day + 30)) AS d FROM act)
        |  JOIN days ON d = days.day GROUP BY d)
        |SELECT CAST(dau.day AS BIGINT) AS day, dau, wau, mau
        |FROM dau JOIN w7 USING (day) JOIN w30 USING (day)
        |ORDER BY day""".stripMargin,

    // percentile_disc(0.5) picks the first value whose cume_dist
    // reaches 0.5 — exactly the rank-(n+1)÷2 lower median the Spark
    // side selects by row_number, value-identical for every n.
    "ts_outlier_mad" ->
      """WITH e AS (SELECT event_id, user_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |med AS (SELECT user_id, CAST(percentile_disc(0.5)
        |      WITHIN GROUP (ORDER BY cents) AS BIGINT) AS med_c
        |  FROM e GROUP BY user_id),
        |d AS (SELECT e.event_id, e.user_id, e.cents, med.med_c,
        |    abs(e.cents - med.med_c) AS dev
        |  FROM e JOIN med USING (user_id)),
        |mad AS (SELECT user_id, CAST(percentile_disc(0.5)
        |      WITHIN GROUP (ORDER BY dev) AS BIGINT) AS mad_c
        |  FROM d GROUP BY user_id)
        |SELECT event_id, d.user_id, cents, med_c, mad_c,
        |  dev * 1000 // greatest(mad_c, 1) AS robust_z_pm,
        |  dev * 10000 > mad_c * 44478 AS outlier
        |FROM d JOIN mad USING (user_id)
        |ORDER BY event_id""".stripMargin,

    "ts_resample" ->
      """WITH e AS (SELECT event_type, value,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 900 AS bin
        |  FROM events),
        |agg AS (SELECT event_type, bin, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |  FROM e GROUP BY event_type, bin),
        |bounds AS (SELECT min(bin) AS lo, max(bin) AS hi FROM e),
        |grid AS (SELECT t.event_type, g.bin
        |  FROM (SELECT DISTINCT event_type FROM e) t
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS bin
        |              FROM bounds) g)
        |SELECT grid.event_type, grid.bin,
        |  grid.bin * 900 AS bin_start_sec,
        |  COALESCE(agg.n, 0) AS n, COALESCE(agg.sum_v, 0.0) AS sum_v
        |FROM grid LEFT JOIN agg
        |  ON agg.event_type = grid.event_type AND agg.bin = grid.bin
        |ORDER BY grid.event_type, grid.bin""".stripMargin,

    "ts_locf" ->
      """SELECT event_id, user_id, event_type, value,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |             IGNORE NULLS) OVER (
        |    PARTITION BY user_id
        |    ORDER BY date_trunc('second', ts), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM events ORDER BY event_id""".stripMargin,

    // Identical expression tree to the Spark side: integer-second t,
    // then pv + (nv - pv) * ((t - pt) / (tn - tp)) in doubles.
    "ts_interpolate" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |    epoch_us(CAST(date_trunc('second', ts) AS TIMESTAMP))
        |      // 1000000 AS t,
        |    CASE WHEN event_type = 'purchase' THEN value END AS obs
        |  FROM events),
        |w AS (SELECT event_id, user_id, event_type, value, t,
        |    last_value(obs IGNORE NULLS) OVER pw AS pv,
        |    last_value(CASE WHEN obs IS NOT NULL THEN t END
        |               IGNORE NULLS) OVER pw AS pt,
        |    first_value(obs IGNORE NULLS) OVER nw AS nv,
        |    first_value(CASE WHEN obs IS NOT NULL THEN t END
        |                IGNORE NULLS) OVER nw AS nt
        |  FROM e
        |  WINDOW pw AS (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  nw AS (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_id, user_id, event_type, value,
        |  CASE WHEN pt IS NOT NULL AND nt IS NOT NULL AND nt <> pt
        |       THEN pv + (nv - pv) * (CAST(t - pt AS DOUBLE)
        |                              / CAST(nt - pt AS DOUBLE))
        |       WHEN pt IS NOT NULL THEN pv ELSE nv END AS interp
        |FROM w ORDER BY event_id""".stripMargin,

    "ts_anomaly" ->
      """SELECT event_id, user_id, value,
        |  CAST(wsum AS DOUBLE) AS wsum, wn,
        |  CAST(value AS DECIMAL(18,2)) * wn > wsum * 2 AS spike
        |FROM (
        |  SELECT event_id, user_id, value,
        |    SUM(CAST(value AS DECIMAL(18,2))) OVER w AS wsum,
        |    COUNT(*) OVER w AS wn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id
        |    ORDER BY date_trunc('second', ts), event_id
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)) t
        |ORDER BY event_id""".stripMargin,

    "ts_gaps" ->
      """SELECT event_id, user_id, gap_sec, gap_sec > 7200 AS is_gap
        |FROM (
        |  SELECT event_id, user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |      - lag(CAST(epoch(date_trunc('second', ts)) AS BIGINT))
        |        OVER (PARTITION BY user_id
        |              ORDER BY date_trunc('second', ts), event_id)
        |      AS gap_sec
        |  FROM events) t
        |ORDER BY event_id""".stripMargin,

    "ts_rate" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |w AS (SELECT event_id, event_type, sec, cents,
        |    lag(sec, 1) OVER
        |      (PARTITION BY event_type ORDER BY sec, event_id) AS prev_sec,
        |    lag(cents, 1) OVER
        |      (PARTITION BY event_type ORDER BY sec, event_id) AS prev_c
        |  FROM e)
        |SELECT event_id, event_type,
        |  cents - prev_c AS delta_c,
        |  sec - prev_sec AS delta_s,
        |  CASE WHEN sec > prev_sec THEN
        |    CAST(cents - prev_c AS DOUBLE) / CAST(sec - prev_sec AS DOUBLE)
        |  END AS rate
        |FROM w WHERE prev_sec IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "win_seqpattern" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec,
        |    event_id FROM events),
        |w AS (SELECT user_id, event_type, sec,
        |    lead(event_type, 1) OVER
        |      (PARTITION BY user_id ORDER BY sec, event_id) AS t1,
        |    lead(event_type, 2) OVER
        |      (PARTITION BY user_id ORDER BY sec, event_id) AS t2
        |  FROM e)
        |SELECT user_id, count(*) AS n_matches, min(sec) AS first_sec
        |FROM w
        |WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "agg_path_ngrams" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |    epoch_us(ts) AS tus FROM events),
        |p AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY tus, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY tus, event_id) AS e3
        |  FROM ev),
        |g AS (SELECT event_type || '>' || e2 || '>' || e3 AS path,
        |    user_id FROM p WHERE e3 IS NOT NULL)
        |SELECT path, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users
        |FROM g GROUP BY path
        |ORDER BY n DESC, path LIMIT 10""".stripMargin,

    "agg_ab_test" ->
      """WITH f AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS rn
        |  FROM events),
        |u AS (SELECT user_id,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |      AS conv
        |  FROM f WHERE rn = 1),
        |v AS (SELECT user_id % 2 AS variant, conv FROM u),
        |g AS (SELECT
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END)
        |      AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END)
        |      AS BIGINT) AS c_b
        |  FROM v)
        |SELECT n_a, c_a, n_b, c_b,
        |  c_a * 1000000 // n_a AS rate_a_ppm,
        |  c_b * 1000000 // n_b AS rate_b_ppm,
        |  CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN
        |    error('agg_ab_test: degenerate pooled rate')
        |  ELSE
        |  round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
        |    / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |    * (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
        |    * (1.0 / n_a + 1.0 / n_b)), 6) END AS z_score
        |FROM g ORDER BY n_a""".stripMargin,

    "agg_cohort_retention" ->
      """WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |cohort AS (SELECT user_id, min(day) AS cd FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, day FROM ev),
        |cells AS (SELECT cd, day - cd AS "offset",
        |    count(DISTINCT a.user_id) AS n_users
        |  FROM act a JOIN cohort c ON a.user_id = c.user_id
        |  WHERE day >= cd GROUP BY cd, day - cd),
        |sz AS (SELECT cd, n_users AS cohort_n FROM cells
        |  WHERE "offset" = 0)
        |SELECT CAST(cd AS BIGINT) AS cd,
        |  CAST("offset" AS BIGINT) AS offset, n_users, cohort_n,
        |  n_users * 1000000 // cohort_n AS ret_ppm
        |FROM cells JOIN sz USING (cd)
        |ORDER BY cd, "offset"""".stripMargin,

    "funnel_window" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus
        |  FROM events),
        |v AS (SELECT user_id, min(tus) AS vt FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, vt, min(tus) AS ct FROM ev e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE event_type = 'click' AND tus > vt
        |    AND tus <= vt + 172800000000 GROUP BY e.user_id, vt),
        |p AS (SELECT e.user_id, ct, min(tus) AS pt FROM ev e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE event_type = 'purchase' AND tus > ct
        |    AND tus <= ct + 172800000000 GROUP BY e.user_id, ct),
        |nv AS (SELECT count(*) AS n_view FROM v),
        |nc AS (SELECT count(*) AS n_click,
        |  CAST(sum(ct - vt) AS BIGINT) AS click_gap_us FROM c),
        |np AS (SELECT count(*) AS n_purchase,
        |  CAST(sum(pt - ct) AS BIGINT) AS purchase_gap_us FROM p)
        |SELECT n_view, n_click, n_purchase, click_gap_us,
        |  purchase_gap_us,
        |  n_click * 1000000 // n_view AS view_click_ppm,
        |  n_purchase * 1000000 // n_click AS click_purch_ppm
        |FROM nv, nc, np ORDER BY n_view""".stripMargin,

    "funnel_steps" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
        |  FROM events),
        |t1 AS (SELECT user_id, min(sec) AS t_view FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(sec) AS t_click
        |  FROM e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE event_type = 'click' AND sec > t_view
        |  GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(sec) AS t_purchase
        |  FROM e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE event_type = 'purchase' AND sec > t_click
        |  GROUP BY e.user_id)
        |SELECT t1.user_id, t_view, t_click, t_purchase,
        |  t_purchase IS NOT NULL AS converted
        |FROM t1
        |LEFT JOIN t2 ON t2.user_id = t1.user_id
        |LEFT JOIN t3 ON t3.user_id = t1.user_id
        |ORDER BY t1.user_id""".stripMargin,

    "win_streak" ->
      """WITH days AS (SELECT DISTINCT user_id,
        |    CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 AS day
        |  FROM events WHERE event_type = 'purchase'),
        |isl AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS island
        |  FROM days),
        |runs AS (SELECT user_id, island, count(*) AS len
        |  FROM isl GROUP BY user_id, island)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_days,
        |  count(*) AS n_streaks, max(len) AS max_streak
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin,

    "ts_downsample" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 21600
        |      AS bucket
        |  FROM events),
        |st AS (SELECT *, count(*) OVER wb AS n,
        |    CAST(sum(cents) OVER wb AS BIGINT) AS sumc
        |  FROM e WINDOW wb AS (PARTITION BY user_id, bucket)),
        |r AS (SELECT *, row_number() OVER (
        |    PARTITION BY user_id, bucket
        |    ORDER BY abs(cents * n - sumc) DESC, event_id) AS rn
        |  FROM st)
        |SELECT user_id, bucket, event_id, value, n AS n_in_bucket
        |FROM r WHERE rn = 1 ORDER BY user_id, bucket""".stripMargin,

    "ts_ohlc" ->
      """WITH e AS (SELECT event_type,
        |    CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
        |      AS day,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) * 1000000000
        |      + event_id AS seq
        |  FROM events)
        |SELECT event_type, day,
        |  arg_min(cents, seq) AS open_c, max(cents) AS high_c,
        |  min(cents) AS low_c, arg_max(cents, seq) AS close_c,
        |  count(*) AS n
        |FROM e GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,

    "ts_cusum" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT *, CAST(sum(cents - 5000) OVER (
        |    PARTITION BY user_id ORDER BY tsec, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM e),
        |st AS (SELECT *, cum - least(0, min(cum) OVER (
        |    PARTITION BY user_id ORDER BY tsec, event_id
        |    ROWS UNBOUNDED PRECEDING)) AS stat FROM c)
        |SELECT user_id, event_id, cents, CAST(stat AS BIGINT) AS stat,
        |  stat > 50000 AS alarm
        |FROM st ORDER BY user_id, tsec, event_id""".stripMargin,

    "ts_seasonality" ->
      """WITH e AS (SELECT event_type,
        |    (CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400 + 4)
        |      % 7 AS dow,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |g AS (SELECT event_type, dow, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sum_c
        |  FROM e GROUP BY event_type, dow),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY sum_c / n DESC, dow) AS rk FROM g)
        |SELECT event_type, dow, n,
        |  round(sum_c / n / 100.0, 12) AS avg_v, rk = 1 AS is_peak
        |FROM r ORDER BY event_type, dow""".stripMargin,

    // Reproduces the corruption split (event_id % 13) and validity
    // filter from the clean table, then mirrors the resample/anomaly/
    // OHLC stages over exact integer cents.
    "pipeline_sensor" ->
      """WITH raw AS (SELECT * FROM events
        |  WHERE event_id % 13 <> 0
        |    AND event_type IN ('click','view','purchase','signup','error')
        |    AND value >= 0.0 AND value <= 10000.0),
        |e AS (SELECT event_type,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 900 AS bin,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM raw),
        |agg AS (SELECT event_type, bin, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sum_c
        |  FROM e GROUP BY event_type, bin),
        |grid AS (SELECT t.event_type, g.bin
        |  FROM (SELECT DISTINCT event_type FROM e) t
        |  CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS bin
        |    FROM (SELECT min(bin) AS lo, max(bin) AS hi FROM e)) g),
        |series AS (SELECT grid.event_type, grid.bin,
        |    COALESCE(agg.n, 0) AS n, COALESCE(agg.sum_c, 0) AS sum_c
        |  FROM grid LEFT JOIN agg
        |    ON agg.event_type = grid.event_type AND agg.bin = grid.bin),
        |fl AS (SELECT *, CAST(sum(sum_c) OVER w AS BIGINT) AS wsum,
        |    count(*) OVER w AS wn
        |  FROM series
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bin
        |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
        |fz AS (SELECT *, sum_c * wn > wsum * 2 AS anom,
        |    bin * 900 // 86400 AS day FROM fl)
        |SELECT event_type, day,
        |  arg_min(sum_c, bin) AS open_c, max(sum_c) AS high_c,
        |  min(sum_c) AS low_c, arg_max(sum_c, bin) AS close_c,
        |  count(*) AS n_bins,
        |  CAST(sum(CASE WHEN anom THEN 1 ELSE 0 END) AS BIGINT) AS n_anom
        |FROM fz GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,

    "ts_norm" ->
      """SELECT event_id, event_type, value,
        |  (value - vmin) / (vmax - vmin) AS norm
        |FROM events JOIN (
        |  SELECT event_type, min(value) AS vmin, max(value) AS vmax
        |  FROM events GROUP BY event_type) ext USING (event_type)
        |ORDER BY event_id""".stripMargin,

    // Mirrors the Spark taps exactly (same generated term list): the
    // weighted sum and weight total are BIGINTs; the single division
    // of identical integers is bit-identical cross-engine.
    "ts_ewma" ->
      s"""WITH e AS (SELECT event_id, user_id, value,
         |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         |    date_trunc('second', ts) AS tsec
         |  FROM events)
         |SELECT event_id, user_id, value,
         |  CAST(($ewmaSum) AS DOUBLE)
         |    / CAST(($ewmaNorm) AS DOUBLE) / 100.0 AS ewma
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY tsec, event_id)
         |ORDER BY event_id""".stripMargin,

    // Same fixed IEEE formula text as agg_regression's r2 (cents
    // descaled inside the expression), with sqrt — IEEE-correctly-
    // rounded in both engines — for the denominator.
    "ts_lagcorr" ->
      """WITH x AS (SELECT
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 900 AS bin,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |y AS (SELECT
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 900 AS ybin,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS yc
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |j AS (SELECT l.lag, COUNT(*) AS n_bins,
        |    SUM(xc) AS sx, SUM(yc) AS sy,
        |    SUM(xc * xc) AS sxx, SUM(yc * yc) AS syy,
        |    SUM(xc * yc) AS sxy
        |  FROM x CROSS JOIN (VALUES (0), (1), (2)) l(lag)
        |  JOIN y ON ybin = bin + l.lag
        |  GROUP BY l.lag)
        |SELECT CAST(lag AS BIGINT) AS lag, n_bins,
        |  round((n_bins * (sxy / 10000.0) - (sx / 100.0) * (sy / 100.0)) /
        |    sqrt((n_bins * (sxx / 10000.0) - (sx / 100.0) * (sx / 100.0)) *
        |      (n_bins * (syy / 10000.0) - (sy / 100.0) * (sy / 100.0))),
        |    12) AS corr
        |FROM j ORDER BY lag""".stripMargin)
}
