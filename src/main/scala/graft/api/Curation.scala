package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Reusable corpus-curation building blocks — the public surface
  * behind the oracled privacy / sampling keys (SURVEY.md §2.M). The
  * privacy audits take ANY list of quasi-identifier columns; the
  * sampler is deterministic under resharding and retries (md5-keyed
  * selection, never rand()/limit whose row order is
  * partition-dependent).
  */
object Curation {

  /** k-anonymity audit: group sizes over the quasi-identifier columns,
    * reduced to the k histogram with a risk flag for groups smaller
    * than `k`. Two stacked aggregates — shuffle width is the distinct
    * QI combinations, then the distinct k values. Output: (k,
    * n_groups, n_rows, risky). */
  def kAnonymity(df: DataFrame, quasiIds: Seq[Column], k: Int = 5)
      : DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_groups"))
      .select(col("k"), col("n_groups"),
        (col("k") * col("n_groups")).as("n_rows"),
        (col("k") < k).as("risky"))
  }

  /** l-diversity audit — k-anonymity's necessary complement: a k-safe
    * group still exposes its members if every record shares one
    * `sensitive` value. Output: (l, n_groups, n_rows, risky) with
    * risky = l < `l`. */
  def lDiversity(df: DataFrame, quasiIds: Seq[Column],
      sensitive: Column, l: Int = 3): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiIds: _*)
      .agg(countDistinct(sensitive).as("l"), count(lit(1)).as("k"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"), sum(col("k")).as("n_rows"))
      .select(col("l"), col("n_groups"), col("n_rows"),
        (col("l") < l).as("risky"))
  }

  /** t-closeness audit (Li et al., ICDE'07) — the third privacy gate:
    * a group can be k-safe AND l-diverse and still leak if its
    * sensitive-value DISTRIBUTION diverges from the table's. For an
    * ORDERED sensitive attribute the distance is the Earth Mover's
    * Distance = (1/(m−1)) · Σ |cumulative (class share − global
    * share)|. Shares never materialize as floats: every term rides
    * the common denominator n_class · n_total as exact BIGINTs, and
    * the single final division of two exact integers < 2^53 is
    * IEEE-correctly-rounded identically cross-engine (§7.4). Output
    * per class: (cls, n_rows, m_bands, emd_num, den, emd_r, risky =
    * emd > t). Scale: two aggregates over the table plus a dense
    * (classes × bands) grid that is dimension-sized, never row-sized
    * — the grid and per-band globals broadcast. */
  def tCloseness(df: DataFrame, cls: Column, band: Column,
      t: Double = 0.2): DataFrame = {
    val base = df.select(cls.as("cls"), band.as("band"))
    val cnt = base.groupBy(col("cls"), col("band"))
      .agg(count(lit(1)).as("n"))
    val classes = base.select(col("cls")).distinct()
    val bands = base.select(col("band")).distinct()
    val globals = base.agg(count(lit(1)).as("n_tot"),
      countDistinct(col("band")).as("m_bands"))
    val gband = base.groupBy(col("band")).agg(count(lit(1)).as("g"))
    val wc = Window.partitionBy(col("cls"))
    val wcum = Window.partitionBy(col("cls")).orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val den = (col("m_bands") - 1L) * col("n_cls") * col("n_tot")
    // r17 (ADVICE): a single sensitive band makes m_bands=1, den=0 and
    // emd = 0/0 = NaN — and both Spark and DuckDB treat NaN > t as
    // TRUE, silently flagging every class risky on a degenerate
    // fixture. One band means every class distribution IS the global
    // distribution, so the defined answer is emd = 0, risky = false.
    // The DuckDB oracle template carries the same CASE guard.
    val emd = when(col("m_bands") <= 1L, lit(0.0))
      .otherwise(col("emd_num").cast(DoubleType) / den.cast(DoubleType))
    classes.crossJoin(broadcast(bands))
      .join(cnt, Seq("cls", "band"), "left")
      .na.fill(0L, Seq("n"))
      .join(broadcast(gband), Seq("band"))
      .crossJoin(broadcast(globals))
      .withColumn("n_cls", sum(col("n")).over(wc))
      .withColumn("diff",
        col("n") * col("n_tot") - col("g") * col("n_cls"))
      .withColumn("cum", sum(col("diff")).over(wcum))
      .groupBy(col("cls"), col("n_cls"), col("m_bands"), col("n_tot"))
      .agg(sum(abs(col("cum"))).as("emd_num"))
      .select(col("cls"), col("n_cls").as("n_rows"), col("m_bands"),
        col("emd_num"), den.as("den"),
        round(emd, 12).as("emd_r"), (emd > t).as("risky"))
  }

  /** Class-balanced downsampling: keep at most `cap` rows per class,
    * selected by md5-hash order with an id tiebreak — deterministic
    * and stable under resharding/retries. Augment-style: returns the
    * KEPT rows with all input columns preserved. At billion-row scale
    * the same selection is a hash-threshold filter with no window;
    * this window form is exact at any cap. */
  def sampleBalanced(df: DataFrame, classCol: String, idCol: String,
      cap: Int, salt: String = "bal:"): DataFrame =
    df.withColumn("__hk",
        md5(concat(lit(salt), col(idCol).cast(StringType))))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(classCol)).orderBy(col("__hk"), col(idCol))))
      .filter(col("__rn") <= cap)
      .drop("__hk", "__rn")

  /** DSIR hashed-feature table (Xie et al. '23): per-bucket Laplace-
    * smoothed TARGET SHARE in exact integer ppm over `buckets`
    * md5-hashed lowercased-whitespace-token features, learned from
    * `isTarget` (any boolean Column over `df`'s rows). The table is
    * `buckets` rows at ANY corpus size — aggregate once, cache/store,
    * broadcast to every consumer. Output: (b, share_ppm) plus the
    * single global share as `g_ppm` on every row (carried inline so
    * the table is self-contained for scoring). */
  def dsirTable(df: DataFrame, isTarget: Column,
      textCol: String = "text", buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"need >= 2 hash buckets, got $buckets")
    val toks = df
      .select(isTarget.as("__t"),
        explode(split(lower(col(textCol)), " ")).as("__term"))
      .withColumn("__b", expr("CAST(conv(substr(md5(__term), 1, 4)," +
        s" 16, 10) AS BIGINT) % $buckets"))
    val feat = toks.groupBy(col("__b").as("b")).agg(
      count(lit(1)).as("__cr"),
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"))
    val g = feat.agg(expr(
      "(sum(__ct) + 1) * 1000000 div (sum(__cr) + 2)").as("g_ppm"))
    feat.select(col("b"),
        expr("(__ct + 1) * 1000000 div (__cr + 2)").as("share_ppm"))
      .crossJoin(broadcast(g))
  }

  /** Per-row DSIR importance score against a learned `dsirTable`:
    * the exact-integer target-share lift Σ cnt·(share_ppm − g_ppm)
    * over the row's hashed token profile — positive ⟺ the row is
    * more target-like than corpus average. Shares are ≤ 10⁶, so
    * scores are bounded by tokens·10⁶ — overflow-free at any corpus
    * size (the ln-based LLR of the paper cannot cross-engine
    * hash-match; see the curate_dsir adjudication in PLANS.md r11).
    * Augment-style: all input columns preserved, plus (n_terms,
    * score, selected). The table side broadcasts (buckets rows). */
  def dsirScores(df: DataFrame, table: DataFrame, idCol: String,
      textCol: String = "text", buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"need >= 2 hash buckets, got $buckets")
    val perBucket = df
      .select(col(idCol).as("__id"),
        explode(split(lower(col(textCol)), " ")).as("__term"))
      .withColumn("b", expr("CAST(conv(substr(md5(__term), 1, 4)," +
        s" 16, 10) AS BIGINT) % $buckets"))
      .groupBy(col("__id"), col("b")).agg(count(lit(1)).as("__cnt"))
    val scored = perBucket.join(broadcast(table), Seq("b"))
      .groupBy(col("__id"))
      .agg(sum(col("__cnt")).as("n_terms"),
        sum(col("__cnt") * (col("share_ppm") - col("g_ppm")))
          .as("score"))
      .select(col("__id"), col("n_terms"), col("score"),
        (col("score") > 0L).as("selected"))
    df.join(scored, col(idCol) === col("__id")).drop("__id")
  }

  /** Deterministic WEIGHTED k-sample: keep the k rows with the
    * smallest priority = hash64(salt, id) div weight — selection
    * pressure proportional to `weightCol` (2× weight halves the
    * priority scale), fully deterministic and re-run/retry stable
    * (never rand(), never A-ES's u^(1/w) — libm pow is not
    * correctly-rounded cross-engine). Plans as TakeOrderedAndProject:
    * per-partition k-heap + driver merge, no global sort. Weights
    * must be positive integers. Output: the k rows + (pri, rk). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "wsample"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // Loud guard: a zero/negative weight would yield a NULL (div 0)
    // or negative priority, and a NULL weight a NULL priority — and
    // NULLS sort FIRST under the ascending cut, so a weightless row
    // would silently ALWAYS win. The NULL branch is explicit (r11
    // ADVICE): nonNegExpr's `< 0` test is NULL on a NULL weight, so
    // without it the guard silently passes the poisoned row through.
    df.withColumn("pri", expr(
        s"CAST(conv(substr(md5(concat('$salt:', " +
          s"CAST($idCol AS STRING))), 1, 15), 16, 10) AS BIGINT)" +
          s" div (CASE WHEN ($weightCol) IS NULL THEN raise_error(" +
          s"'weightedSample: NULL weight (NULL priority sorts first " +
          s"and would always win)') ELSE ${graft.Det.nonNegExpr(
            s"CAST($weightCol AS BIGINT) - 1",
            "weightedSample weight-1")} END + 1)"))
      .orderBy(col("pri"), col(idCol)).limit(k)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("pri"), col(idCol))).cast("long"))
  }

  /** Deterministic epoch shuffle: assign every row a shard (salted
    * md5 bucket) and a within-shard position (ordered by the hash,
    * id tiebreak) — the shard + read-order a training run consumes,
    * stable under re-runs, retries, and resharding. The per-shard
    * row_number is a range-partitioned sort of one shard — exactly
    * the epoch-shard write path at scale. Output: input columns +
    * (hkey, shard, pos). */
  def epochShards(df: DataFrame, idCol: String, shards: Int,
      salt: String = "shard"): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    df.withColumn("hkey", md5(concat(lit(s"$salt:"),
        col(idCol).cast(StringType))))
      .withColumn("shard", expr(
        s"CAST(conv(substr(hkey, 1, 4), 16, 10) AS BIGINT) % $shards"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("hkey"), col(idCol))))
  }
}
