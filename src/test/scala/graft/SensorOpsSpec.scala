package graft

import org.apache.spark.sql.functions._

/** Laws for the §2.N sensor time-series family, on sf0.001 fixtures. */
class SensorOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def q(key: String) = SparkEntry.queries(key)(spark, sf)

  test("ts_resample: grid is complete, contiguous, and count-preserving") {
    val r = q("ts_resample").cache()
    val types = r.select($"event_type").distinct().count()
    val bins = r.select($"bin").distinct().count()
    assert(r.count() == types * bins, "full type x bin grid")
    val ends = r.agg(min($"bin"), max($"bin")).head()
    assert(bins == ends.getLong(1) - ends.getLong(0) + 1,
      "bins contiguous, gaps filled")
    assert(r.agg(sum($"n")).head().getLong(0) ==
      Tables.load(spark, sf, "events").count(),
      "resample preserves the event count")
    r.unpersist()
  }

  test("ts_locf: filled lags the user's purchase history exactly") {
    val l = q("ts_locf").cache()
    // Null only before a user's first purchase.
    val e = Tables.load(spark, sf, "events")
    val firstPurchase = e.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"event_id").as("first_p"))
    val nullsAfter = l.join(firstPurchase, "user_id")
      .filter($"filled".isNull && $"event_id" >= $"first_p")
    assert(nullsAfter.count() == 0, "no nulls after first purchase")
    // On purchase rows, filled == own value.
    assert(l.filter($"event_type" === "purchase" &&
      $"filled" =!= $"value").count() == 0)
    l.unpersist()
  }

  test("ts_anomaly: frame is bounded and the flag matches its definition") {
    val a = q("ts_anomaly").cache()
    assert(a.filter($"wn" > 20 || $"wn" < 1).count() == 0,
      "trailing frame never exceeds 20 rows")
    val bad = a.filter($"spike" =!=
      (expr("CAST(value AS DECIMAL(18,2))") * $"wn" >
        expr("CAST(wsum AS DECIMAL(38,2))") * 2))
    assert(bad.count() == 0, "flag consistent with window stats")
    a.unpersist()
  }

  test("ts_norm: normalized values span [0,1] per type") {
    val n = q("ts_norm").cache()
    assert(n.filter($"norm" < 0.0 || $"norm" > 1.0).count() == 0)
    val spans = n.groupBy($"event_type")
      .agg(min($"norm").as("lo"), max($"norm").as("hi"))
    assert(spans.filter($"lo" =!= 0.0 || $"hi" =!= 1.0).count() == 0,
      "extrema map to exactly 0 and 1")
    n.unpersist()
  }
}
