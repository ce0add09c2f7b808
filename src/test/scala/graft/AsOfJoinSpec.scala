package graft

import graft.plans.{AsOfJoin, AsOfJoinExec}
import org.apache.spark.sql.functions._

/** The native as-of operator must agree exactly with the composable
  * rewrite (range join + window row_number=1) that the oracled
  * `join_asof` key uses — same matches, same tie-breaks, same
  * tolerance boundary — while planning as a single merge operator.
  */
class AsOfJoinSpec extends SparkTestBase {

  import spark.implicits._

  private def purchases(dir: String) =
    Tables.load(spark, dir, "events")
      .filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"),
              date_trunc("second", $"ts").as("p_ts"))

  private def clicks(dir: String) =
    Tables.load(spark, dir, "events")
      .filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"),
              date_trunc("second", $"ts").as("c_ts"),
              $"value".as("c_value"))

  private def nativeAsof(dir: String) =
    AsOfJoin.asof(purchases(dir), clicks(dir),
        key = ("p_user", "c_user"), ts = ("p_ts", "c_ts"),
        rightTies = Seq("c_id"), toleranceMicros = 86400L * 1000000)
      .select($"p_id", $"c_id", $"c_value")

  test("native as-of == window rewrite on fixture data") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val want = SparkEntry.queries("join_asof")(spark, dir)
      assertSameRows(nativeAsof(dir), want, s"asof@$dir")
    }
  }

  test("plan is a single AsOfJoinExec merge, no fan-out window") {
    val df = nativeAsof(sf)
    val plan = df.queryExecution.executedPlan
    assert(plan.collectFirst { case e: AsOfJoinExec => e }.isDefined ||
      plan.toString.contains("AsOfJoin"),
      s"native operator not planned:\n$plan")
    assert(!plan.toString.contains("Window"),
      "native path must not fan out through a window")
  }

  test("tolerance boundary and equal-ts ties behave like the rewrite") {
    val l = Seq(
      (1L, 100L, ts(1000)), (2L, 100L, ts(5000)), (3L, 200L, ts(900)))
      .toDF("p_id", "p_user", "p_ts")
    val r = Seq(
      (10L, 100L, ts(999), 1.0),   // before p1
      (11L, 100L, ts(1000), 2.0),  // ties p1's ts — wins (<=)
      (12L, 100L, ts(1000), 3.0),  // same ts, higher id — wins tie
      (13L, 100L, ts(4000), 4.0),  // exactly tol before p2 → excluded
      (14L, 200L, ts(899), 5.0))   // match for p3
      .toDF("c_id", "c_user", "c_ts", "c_value")
    // tolerance 1000s: c_ts > p_ts - 1000s (strict)
    val got = AsOfJoin.asof(l, r, ("p_user", "c_user"),
        ("p_ts", "c_ts"), Seq("c_id"), 1000L * 1000000)
      .select($"p_id", $"c_id", $"c_value")
    // p1: c11/c12 tie at exactly p_ts → higher c_id (12) wins.
    // p2: only c13 at exactly p_ts − tol, and the bound is STRICT
    //     (c_ts > p_ts − tol) → no match, row dropped (inner).
    // p3: plain in-window match.
    val want = Seq((1L, 12L, 3.0), (3L, 14L, 5.0))
      .toDF("p_id", "c_id", "c_value")
    assertSameRows(got, want, "boundary+ties")
  }

  private def ts(sec: Long): java.sql.Timestamp =
    new java.sql.Timestamp(sec * 1000)

  test("property: native == rewrite on 20 random key/ts distributions") {
    // Deterministic pseudo-random inputs (fixed LCG seeds) with heavy
    // key collisions and ts ties — the shapes where a merge-pointer
    // bug would hide. The rewrite is the executable spec.
    val win = org.apache.spark.sql.expressions.Window
    for (seed <- 1 to 20) {
      var x = seed.toLong
      def rnd(m: Long): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); math.floorMod(x >>> 16, m) }
      val ls = (1 to 80).map(i =>
        (i.toLong, rnd(5), ts(rnd(50) * 10)))
      val rs = (1 to 120).map(i =>
        (i.toLong, rnd(5), ts(rnd(50) * 10), rnd(1000).toDouble))
      val l = ls.toDF("p_id", "p_user", "p_ts")
      val r = rs.toDF("c_id", "c_user", "c_ts", "c_value")
      val tol = (rnd(30) + 1) * 10 * 1000000L // 10s..300s in micros
      val got = plans.AsOfJoin.asof(l, r, ("p_user", "c_user"),
          ("p_ts", "c_ts"), Seq("c_id"), tol)
        .select($"p_id", $"c_id", $"c_value")
      val want = l.join(r, $"p_user" === $"c_user" &&
            $"c_ts" <= $"p_ts" &&
            $"c_ts" > $"p_ts" - expr(s"INTERVAL ${tol / 1000000} SECONDS"))
        .withColumn("rn", row_number().over(win.partitionBy($"p_id")
          .orderBy($"c_ts".desc, $"c_id".desc)))
        .filter($"rn" === 1)
        .select($"p_id", $"c_id", $"c_value")
      assertSameRows(got, want, s"asof property seed=$seed tol=$tol")
    }
  }
}
