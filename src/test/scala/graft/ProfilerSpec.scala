package graft

import graft.operators.Profiler
import org.apache.spark.sql.functions._

/** Accuracy contracts for the two sketch outputs — the only keys in
  * the inventory without a cross-engine oracle (approx results):
  * `profile_sketch` (MiscQueries) and `agg_approx_distinct`
  * (AggQueries). Both are bounded here against their exact
  * counterparts, so no output in the inventory ships unverified.
  */
class ProfilerSpec extends SparkTestBase {

  import spark.implicits._

  private val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
  private val rsd = 0.02

  test("profile_sketch vs exact: exact fields bit-equal, n_distinct " +
       "within 3·rsd, at sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val li = Tables.load(spark, dir, "lineitem")
      def byCol(exact: Boolean) =
        Profiler.profile(li, cols, exact).collect()
          .map(r => r.getAs[String]("col") -> r).toMap
      val e = byCol(exact = true)
      val s = byCol(exact = false)
      assert(e.keySet == cols.toSet && s.keySet == cols.toSet, dir)
      for (c <- cols) {
        // n / n_nonnull / extrema don't depend on the sketch — the two
        // modes must agree exactly (doubles bit-equal).
        assert(e(c).getAs[Long]("n") == s(c).getAs[Long]("n"), s"$dir $c n")
        assert(e(c).getAs[Long]("n_nonnull") == s(c).getAs[Long]("n_nonnull"),
          s"$dir $c n_nonnull")
        assert(java.lang.Double.doubleToLongBits(e(c).getAs[Double]("min_v"))
          == java.lang.Double.doubleToLongBits(s(c).getAs[Double]("min_v")),
          s"$dir $c min_v")
        assert(java.lang.Double.doubleToLongBits(e(c).getAs[Double]("max_v"))
          == java.lang.Double.doubleToLongBits(s(c).getAs[Double]("max_v")),
          s"$dir $c max_v")
        val nd = e(c).getAs[Long]("n_distinct")
        val nds = s(c).getAs[Long]("n_distinct")
        assert(math.abs(nds - nd) <= 3 * rsd * nd,
          s"$dir $c n_distinct: sketch $nds vs exact $nd " +
            s"exceeds 3·rsd bound ${3 * rsd * nd}")
      }
    }
  }

  test("agg_approx_distinct: per-group within 3·rsd of exact") {
    val approx = SparkEntry.queries("agg_approx_distinct")(spark, sf)
      .select($"event_type", $"approx_users", $"n_events")
    val exact = Tables.load(spark, sf, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact_users"),
           count(lit(1)).as("n_events_exact"))
    val joined = approx.join(exact, Seq("event_type")).collect()
    assert(joined.nonEmpty, "no groups")
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_users")
      val x = r.getAs[Long]("exact_users")
      assert(math.abs(a - x) <= 3 * rsd * x,
        s"event_type ${r.getAs[String]("event_type")}: approx $a vs " +
          s"exact $x exceeds 3·rsd bound ${3 * rsd * x}")
      assert(r.getAs[Long]("n_events") == r.getAs[Long]("n_events_exact"))
    }
  }

  test("agg_approx_percentile: reported values sit at the target rank " +
       "within the sketch's error bound") {
    val ap = SparkEntry.queries("agg_approx_percentile")(spark, sf)
      .collect().map(r => r.getAs[String]("seg") -> r).toMap
    val base = Tables.load(spark, sf, "orders")
      .join(Tables.load(spark, sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment".as("seg"), $"o_totalprice".as("price"))
      .collect().groupBy(_.getAs[String]("seg"))
      .view.mapValues(_.map(_.getAs[Double]("price")).sorted).toMap
    assert(ap.keySet == base.keySet)
    for ((seg, r) <- ap; (v, p) <- Seq(
        r.getAs[Double]("p50_approx") -> 0.5,
        r.getAs[Double]("p90_approx") -> 0.9)) {
      val xs = base(seg)
      val n = xs.length
      assert(r.getAs[Long]("n") == n, s"$seg n")
      // rank error bound: accuracy=10000 guarantees <= n/10000 (< 1
      // at this sf); allow 1% of n plus the discrete-rank slack of 1.
      val rankLo = xs.count(_ < v)
      val rankHi = xs.count(_ <= v)
      val target = p * n
      val tol = math.max(1.0, 0.01 * n)
      assert(rankLo - tol <= target && target <= rankHi + tol,
        s"$seg p$p: value $v has rank [$rankLo,$rankHi], " +
          s"target $target, tol $tol, n=$n")
    }
  }

  test("exact profiler counts RAW distinct values, not decimal-cast " +
       "collapses; extrema keep the DECIMAL(18,2) rendering") {
    // 1.001 and 1.002 collapse under CAST(DECIMAL(18,2)); the distinct
    // count must still see 3 values (the ADVICE r4 defect).
    val df = Seq(Some(1.001), Some(1.002), Some(1.25), None).toDF("x")
    val p = Profiler.profile(df, Seq("x"), exact = true).collect()
    assert(p.length == 1)
    val r = p.head
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Long]("n_nonnull") == 3)
    assert(r.getAs[Long]("n_distinct") == 3,
      s"raw distinct expected 3, got ${r.getAs[Long]("n_distinct")}")
    assert(r.getAs[Double]("min_v") == 1.0)
    assert(r.getAs[Double]("max_v") == 1.25)
  }

  test("sketch_hll_merge: shard-merged estimate == global estimate, " +
       "both within 3·rsd of exact") {
    // Merge invariance is THE distributed-sketch property: same lgK
    // registers merge by max, so 16 shard sketches unioned must give
    // bit-identical estimates to one pass over all rows.
    val rows = SparkEntry.queries("sketch_hll_merge")(spark, sf).collect()
    assert(rows.nonEmpty, "no groups")
    val rsd12 = 1.04 / math.sqrt(1 << 12)
    rows.foreach { r =>
      val merged = r.getAs[Long]("est_merged")
      val global = r.getAs[Long]("est_global")
      val exact = r.getAs[Long]("exact")
      assert(merged == global,
        s"${r.getAs[String]("event_type")}: merge changed the " +
          s"estimate ($merged != $global)")
      assert(math.abs(merged - exact) <= 3 * rsd12 * exact + 1,
        s"${r.getAs[String]("event_type")}: estimate $merged vs " +
          s"exact $exact exceeds 3·rsd")
    }
  }

  test("sketch_kmv: estimate within 3·RSE of exact; sketch is exact " +
       "below k") {
    // KMV RSE ≈ 1/sqrt(k-2) (Bar-Yossef et al. 2002); k=32 → ~18%.
    // Cross-engine equality is the DuckDB oracle's job — this law
    // pins that the estimator is actually ESTIMATING.
    val k = 32
    val rows = SparkEntry.queries("sketch_kmv")(spark, sf).collect()
    assert(rows.nonEmpty, "no groups")
    val exact = Tables.load(spark, sf, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rse = 1.0 / math.sqrt(k - 2)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val est = r.getAs[Double]("est_users")
      val ex = exact(t)
      if (r.getAs[Long]("k_eff") < k)
        assert(est == ex.toDouble, s"$t: below-k sketch must be exact")
      else
        assert(math.abs(est - ex) <= 3 * rse * ex,
          s"$t: estimate $est vs exact $ex exceeds 3·RSE")
    }
  }

  test("empty input yields one row per column with n=0 in both modes") {
    val empty = Tables.load(spark, sf, "lineitem").filter(lit(false))
    for (exact <- Seq(true, false)) {
      val p = Profiler.profile(empty, cols, exact)
        .orderBy($"col").collect()
      assert(p.length == cols.size, s"exact=$exact rows")
      p.foreach { r =>
        assert(r.getAs[Long]("n") == 0, s"exact=$exact n")
        assert(r.getAs[Long]("n_nonnull") == 0)
        assert(r.getAs[Long]("n_distinct") == 0)
        assert(r.isNullAt(r.fieldIndex("min_v")), s"exact=$exact min_v")
        assert(r.isNullAt(r.fieldIndex("max_v")), s"exact=$exact max_v")
      }
    }
  }
}
