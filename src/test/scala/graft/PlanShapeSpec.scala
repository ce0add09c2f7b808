package graft

/** Physical-plan shape assertions (SURVEY.md §5.3): the point is not
  * that a query returns rows but that Catalyst picked the plan the
  * 100-TB design requires — broadcast vs shuffle join, top-k instead
  * of global sort, scan-level filter/column pushdown, rank-limit
  * pushdown into windows.
  */
class PlanShapeSpec extends SparkTestBase {

  private def planOf(key: String): String = {
    val df = SparkEntry.queries(key)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("join_broadcast plans a BroadcastHashJoin") {
    assert(planOf("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_shuffle plans a SortMergeJoin (broadcast pinned off)") {
    assert(planOf("join_shuffle").contains("SortMergeJoin"))
  }

  test("join_anti plans a LeftAnti join") {
    assert(planOf("join_anti").contains("LeftAnti"))
  }

  test("sort_limit_topk plans TakeOrderedAndProject, not a global sort") {
    assert(planOf("sort_limit_topk").contains("TakeOrderedAndProject"))
  }

  test("win_topk_pergroup pushes the rank limit into the window") {
    // Spark 3.5+/4.x WindowGroupLimit stops per-partition work at k
    // rows instead of ranking the whole partition then filtering.
    assert(planOf("win_topk_pergroup").contains("WindowGroupLimit"))
  }

  test("scan_pruned pushes filter and prunes columns at the scan") {
    val p = planOf("scan_pruned")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThan(l_extendedprice"),
      s"filter not pushed to scan:\n$p")
    assert(p.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int," +
        "l_extendedprice:double>"),
      s"scan reads more than the 3 projected columns:\n$p")
  }

  test("scan_time_range pushes the time-range predicate to the events scan") {
    // The ts-canonicalizing projection in Tables.load("events") blocks
    // ts pushdown; loadEventsBetween phrases the range on the RAW
    // column in its native fixture type (long ns / NTZ timestamp)
    // BEFORE the projection, so the scan must advertise both bounds —
    // that's what lets parquet row-group min/max stats prune a time
    // window at scale, for either fixture generation.
    val p = planOf("scan_time_range")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"),
      s"ts range not pushed to the events scan:\n$p")
    // And the pushed form must agree with filtering after conversion.
    val pushed = SparkEntry.queries("scan_time_range")(spark, sf)
    val unpushed = {
      import org.apache.spark.sql.functions._
      Tables.load(spark, sf, "events")
        .filter(col("ts") >= lit("2024-01-16 00:00:00") &&
                col("ts") < lit("2024-01-18 00:00:00"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_v"))
        .orderBy(col("event_type"))
    }
    assertSameRows(pushed, unpushed, "pushed vs post-projection filter")
  }

  test("agg_hash is a two-phase HashAggregate inside codegen") {
    val df = SparkEntry.queries("agg_hash")(spark, sf)
    df.collect() // execute THIS plan so AQE finalizes codegen stages
                 // (count() would build its own QueryExecution)
    val p = df.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "partial+final aggregate split missing")
    // simpleString marks whole-stage-codegen pipelines as "*(n) Op".
    assert(p.contains("*("), "no whole-stage-codegen span in final plan")
  }

  test("fn_explode plans a Generate (UDTF surface)") {
    assert(planOf("fn_explode").contains("Generate"))
  }

  test("vec_knn broadcasts the bounded query side") {
    val p = planOf("vec_knn")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), s"query side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      "unbounded cartesian product in knn plan")
  }

  test("dedup_near joins on the fingerprint, no cartesian product") {
    val p = planOf("dedup_near")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup degenerated to all-pairs:\n$p")
  }

  test("join_multiway broadcasts every dimension table") {
    val p = planOf("join_multiway")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"star-join dimensions not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("join_theta_range is a bucketed equi-join, never nested-loop") {
    // r3 rewrite: the range condition rides on a (user, hour-bucket)
    // equi key; a BNLJ/cartesian here means per-user quadratic fanout.
    val p = planOf("join_theta_range")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"theta-range join lost its equi-bucket key:\n$p")
  }

  test("dedup_ngram ships trigram sets as arrays — no shingle explode") {
    // Generates from the token-blocking stage are fine; a Generate
    // over the trigram expression (substring windows) means the
    // trigram sets went back to an exploded corpus-wide shuffle.
    val p = planOf("dedup_ngram")
    val shingleGen = p.linesIterator
      .filter(_.contains("Generate")).filter(_.contains("substring"))
    assert(shingleGen.isEmpty,
      s"trigram shingles exploded again:\n${shingleGen.mkString}")
    assert(!p.contains("CartesianProduct"))
  }

  test("dedup_minhash: map-side term hash — no join, no window, no dict") {
    // The r10 scale fix: term ids are a codegen termhash computed in
    // the scan projection, so the whole signature build is scan →
    // partial agg → exchange → final agg. A Join in this plan means a
    // dictionary resurfaced; a Window means the global row_number id
    // assignment came back — both single-task a 100-TB vocabulary.
    val p = planOf("dedup_minhash")
    assert(!p.contains("Join"), s"dictionary join resurfaced:\n$p")
    assert(!p.contains("Window"),
      s"global id-assignment window resurfaced:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"partial+final signature aggregate missing:\n$p")
  }

  test("dedup_minhash_pairs joins on band buckets, never all-pairs") {
    val p = planOf("dedup_minhash_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"LSH candidate generation degenerated to all-pairs:\n$p")
  }

  test("dedup_hamming joins on the signature block, never all-pairs") {
    val p = planOf("dedup_hamming")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"hamming candidates degenerated to all-pairs:\n$p")
  }

  test("agg_mode pushes the rank-1 limit into the window") {
    // The rn=1 filter must become WindowGroupLimit (partial+final), so
    // per-partition work stops at the top row instead of ranking every
    // (segment, nation) group then filtering.
    assert(planOf("agg_mode").contains("WindowGroupLimit"))
  }

  test("AQE converts a runtime-small join side to broadcast") {
    // The 100-TB relevance: static stats can't see post-filter
    // selectivity, so the planner picks SMJ; AQE must re-plan to BHJ
    // from the REAL shuffle size at runtime. Static broadcast is
    // pinned off so only the adaptive conversion can produce the BHJ.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    try {
      val l = Tables.load(spark, sf, "lineitem")
      val o = Tables.load(spark, sf, "orders")
        .filter($"o_totalprice" > 400000)
      val j = l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"AQE did not finalize:\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"AQE did not convert the runtime-small side to broadcast:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("runtime bloom filter prunes the probe side of a selective SMJ") {
    // The other runtime re-plan that matters at 100 TB: when a
    // selective dim filter feeds a shuffle join, Spark injects a bloom
    // filter built from the filtered side and applies it as
    // might_contain ON THE FACT SCAN SIDE — fact rows that cannot join
    // are dropped before the shuffle, not after. Thresholds are
    // lowered to fire at fixture scale; broadcast is pinned off so the
    // join genuinely shuffles (the broadcast path needs no bloom).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "10MB")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    try {
      val l = Tables.load(spark, sf, "lineitem")
      val o = Tables.load(spark, sf, "orders")
        .filter($"o_totalprice" > 400000)
      val j = l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
      val opt = j.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"no runtime bloom filter injected:\n$opt")
      // And the filtered plan still returns the right rows.
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = {
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled",
          "false")
        l.join(o, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
      assert(got == want, s"bloom-filtered result diverged: $got vs $want")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("join_skew_salted plans SMJ on the salted keys, no broadcast") {
    // The point of the operator: the dim side must NOT broadcast (that
    // would bypass the salting) and the join must be an equi-join on
    // (suppkey, salt) so a hot suppkey spreads over 8 partitions.
    val p = planOf("join_skew_salted")
    assert(p.contains("SortMergeJoin") &&
      !p.contains("BroadcastHashJoin"), s"salting bypassed:\n$p")
  }

  test("sketch_cms: top-k via TakeOrderedAndProject, sketch broadcast") {
    // The heavy-hitter query must never plan a global (unpartitioned)
    // Window for top-k, and the d*w=1004-cell sketch joins broadcast.
    val p = planOf("sketch_cms")
    assert(p.contains("TakeOrderedAndProject") &&
      p.contains("BroadcastHashJoin") &&
      !p.contains("WindowExec"), s"cms plan degenerated:\n$p")
  }

  test("dedup_hamming64 joins on (k, blk), never all-pairs") {
    val p = planOf("dedup_hamming64")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"multi-block hamming candidates degenerated to all-pairs:\n$p")
  }

  test("text_contamination broadcasts the bench gram set — no Window") {
    // r6 rewrite: benchmark grams are distinct-reduced and broadcast
    // into a left-semi hash join. A Window (or Sort below the joins)
    // means the plan regressed to the r3 corpus-wide gram sort; a
    // non-broadcast semi join means the tiny bench side shuffled the
    // whole corpus instead.
    val p = planOf("text_contamination")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"bench gram set no longer broadcast-semi-joined:\n$p")
    assert(!p.contains("Window"),
      s"corpus-wide gram window resurfaced:\n$p")
  }

  test("profile_table melts with a Generate — no Expand multi-distinct") {
    // The r4 rewrite's whole argument: 3 exact distinct counts in one
    // pass via melt + two-phase (col, value) aggregate. An Expand here
    // means Catalyst fell back to the multi-distinct plan that
    // triplicates the scan output before shuffling.
    val p = planOf("profile_table")
    assert(p.contains("Generate"), s"melt Generate missing:\n$p")
    assert(!p.contains("Expand"),
      s"multi-distinct Expand resurfaced in profile_table:\n$p")
  }

  test("profile_sketch is ONE two-phase aggregate over the scan") {
    // The 100-TB default profiler: partial HLL sketches merge map-side
    // and exactly one exchange carries KB-scale state. A second
    // aggregate pair (or an Expand) means the single-pass plan broke.
    val p = planOf("profile_sketch")
    assert("HashAggregate".r.findAllIn(p).size == 2,
      s"expected exactly partial+final HashAggregate:\n$p")
    assert(!p.contains("Expand"), s"Expand in sketch plan:\n$p")
  }

  test("scan_dpp carries a dynamic-pruning partition filter") {
    // Correct rows come back with DPP silently off too — the plan
    // must prove only matching partition directories are scanned.
    val p = planOf("scan_dpp")
    assert(p.contains("dynamicpruning"),
      s"no dynamicpruningexpression in the partitioned scan:\n$p")
  }

  test("sub_exists_select plans an ExistenceJoin (annotate, not filter)") {
    // EXISTS in the SELECT list must become the annotating join type —
    // a per-row COUNT subquery shape would scan orders once per
    // customer.
    assert(planOf("sub_exists_select").contains("ExistenceJoin"))
  }

  test("ts_resample joins the grid to the reduced aggregate only") {
    // The only nested-loop join allowed is the grid cross join whose
    // build side is the 1-row bounds aggregate / 5-row type dim;
    // the raw events table must reach exactly one aggregation.
    val p = planOf("ts_resample")
    assert(!p.contains("CartesianProduct"), s"unplanned cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("SortMergeJoin"), s"gap-fill join missing:\n$p")
  }

  test("graph_triangles: all equi-joins, no cartesian wedge closure") {
    // The wedge generation and closure must be hash/merge EQUI-joins
    // on oriented endpoints — a CartesianProduct here is the all-pairs
    // O(V²) degeneration the degree orientation exists to prevent.
    // (The only nested-loop joins allowed are the final three
    // single-row count aggregates combined by broadcast cross join.)
    val p = planOf("graph_triangles")
    assert(!p.contains("CartesianProduct"),
      s"wedge closure degenerated to cartesian:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      s"no equi-join in the triangle plan:\n$p")
  }

  test("win_seqpattern: one window pass, no self-join") {
    // The operator's reason to exist: both leads share ONE
    // (user_id)(sec, event_id) window — a SortMergeJoin in the plan
    // means it regressed to the 3-way self-join shape the R8OpsSpec
    // law uses as its independent check.
    val p = planOf("win_seqpattern")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      s"window pass missing:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"seqpattern regressed to a self-join:\n$p")
  }

  test("scan_metadata reads lineage from the scan, not a re-listing join") {
    // _metadata must come from the file scan itself (a hidden struct
    // column) — any join in this plan means a re-listing side channel.
    val p = planOf("scan_metadata")
    assert(!p.contains("Join"), s"metadata via join, not scan:\n$p")
    assert(p.toLowerCase.contains("_metadata"),
      s"hidden metadata column missing from scan:\n$p")
  }
}
