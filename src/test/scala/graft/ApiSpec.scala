package graft

import org.apache.spark.sql.functions._

/** The public `graft.api` surface must be GENERIC: same functions the
  * oracled keys delegate to (equivalence proven by those oracles),
  * exercised here on ad-hoc non-fixture frames with caller-chosen
  * column names — the "a user could switch their own tables to this
  * library" claim, tested.
  */
class ApiSpec extends SparkTestBase {

  import spark.implicits._

  test("TextDedup end-to-end on an ad-hoc corpus finds the near-dups") {
    val corpus = Seq(
      (101L, "the quick brown fox jumps over the lazy dog"),
      (102L, "the quick brown fox jumps over the lazy cat"),
      (103L, "completely different content about spark engines"),
      (104L, "the quick brown fox jumps over the lazy dog")
    ).toDF("article_id", "body")
    val tok = api.TextDedup.tokens(corpus, "article_id", "body")
    val sigs = api.TextDedup.minhashSignatures(tok)
    // Exact duplicates 101/104 must share EVERY band; the unrelated
    // 103 must not collide with them on all bands.
    val bands = sigs.select($"doc_id", $"band1", $"band2", $"band3",
      $"band4").collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(bands(101L) == bands(104L), "exact dups must share all bands")
    assert(bands(101L) != bands(103L), "unrelated docs collide everywhere")

    // LSH pair pipeline: the exact dup pair must survive with all 8
    // minhashes agreeing; the near-dup (one token differs) may pair
    // but never at full agreement with the unrelated doc.
    val pairs = api.TextDedup.minhashPairs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(pairs.get((101L, 104L)).contains(8L),
      s"exact dups must pair at n_agree=8: $pairs")
    assert(!pairs.keySet.exists { case (a, b) =>
      (a == 103L || b == 103L) && pairs((a, b)) == 8L },
      s"unrelated doc pairs at full agreement: $pairs")
    // Band fold overflow is a loud error, never silent bucket aliasing:
    // prime^bandRows must fit int64 (fails here: (2^31-1)^4).
    intercept[IllegalArgumentException] {
      api.TextDedup.minhashSignatures(tok, bandRows = 4)
    }

    val sh = api.TextDedup.simhash16(
      api.TextDedup.termFreqs(corpus, "article_id", "body"))
    val cand = api.TextDedup.hammingCandidates(sh, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((101L, 104L)),
      "identical docs must be Hamming candidates at distance 0")

    // One-call removal (r11): the exact dup 104 is dropped for its
    // cluster canonical 101; the unrelated doc and any doc without a
    // gated pair survive with all input columns intact.
    val survivors = api.TextDedup.dedupCorpus(corpus, "article_id", "body")
    val ids = survivors.select($"article_id").collect()
      .map(_.getLong(0)).toSet
    assert(!ids.contains(104L), s"exact dup must be removed: $ids")
    assert(ids.contains(101L) && ids.contains(103L),
      s"canonical + unrelated must survive: $ids")
    assert(survivors.columns.toSeq == Seq("article_id", "body"),
      "dedupCorpus must preserve the input schema")
  }

  test("TextDedup.dictionary assigns dense 1-based ids in term order " +
       "without a global window") {
    // The r9 scale fix: dense ids via range-repartition + zipWithIndex
    // instead of an unpartitioned row_number window. The law is the
    // dictionary CONTRACT: ids are exactly 1..V following term order,
    // regardless of input layout.
    val terms = Seq("delta", "alpha", "echo", "charlie", "bravo",
        "alpha", "delta")
      .toDF("term").repartition(5)
    val d = api.TextDedup.dictionary(terms)
      .orderBy($"tid").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(d.toSeq == Seq("alpha" -> 1L, "bravo" -> 2L, "charlie" -> 3L,
      "delta" -> 4L, "echo" -> 5L), s"dictionary contract broken: ${d.toSeq}")
  }

  test("VectorSearch.knnCosine on ad-hoc embeddings ranks by cosine") {
    val qs = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "v")
    val corpus = Seq(
      (10L, Array(0.9f, 0.1f)),   // nearly parallel — best
      (11L, Array(0.0f, 1.0f)),   // orthogonal — worst
      (12L, Array(0.7f, 0.7f))    // diagonal — middle
    ).toDF("id", "v")
    val r = api.VectorSearch.knnCosine(qs, corpus, k = 3,
        qIdCol = "id", qVecCol = "v", cIdCol = "id", cVecCol = "v")
      .orderBy($"rank").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(10L, 12L, 11L),
      s"cosine ranking wrong: ${r.mkString(",")}")
  }

  test("Events.seqPattern generalizes to a 2-step and a 4-step pattern") {
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "c", 30L, 3L),
      (1L, "d", 40L, 4L),
      (2L, "a", 10L, 5L), (2L, "c", 20L, 6L) // no a→b adjacency
    ).toDF("who", "kind", "at", "seq")
    val two = api.Events.seqPattern(ev, "who", "kind", "at", "seq",
      Seq("a", "b")).collect()
    assert(two.length == 1 && two.head.getLong(0) == 1L &&
      two.head.getLong(1) == 1L, "a→b must match once for entity 1 only")
    val four = api.Events.seqPattern(ev, "who", "kind", "at", "seq",
      Seq("a", "b", "c", "d")).collect()
    assert(four.length == 1 && four.head.getLong(2) == 10L,
      "4-step pattern must match from the first event")
  }

  test("TimeSeries augment-style ops on an ad-hoc frame") {
    val readings = Seq(
      ("probe-A", 0L, 1L, 10.0, "calib"),
      ("probe-A", 60L, 2L, 11.0, "reading"),
      ("probe-A", 120L, 3L, 99.0, "reading"),  // spike vs trailing mean
      ("probe-B", 0L, 4L, 5.0, "reading")
    ).toDF("probe", "t", "rid", "temp", "kind")
    // locf fills only from matching observations and keeps ALL columns.
    val f = api.TimeSeries.locf(readings, "probe", "t", "rid", "temp",
      isObservation = $"kind" === "reading")
    assert(f.columns.contains("kind") && f.columns.contains("filled"),
      "locf must augment, not reshape")
    val a1 = f.filter($"rid" === 1L).head()
    assert(a1.isNullAt(a1.fieldIndex("filled")),
      "calibration row precedes any reading — filled must be NULL")
    // rollingSpike flags the jump, not the steady rows.
    val sp = api.TimeSeries.rollingSpike(readings, "probe", "t", "rid",
      "temp", lookback = 3, factor = 2)
    val spikes = sp.filter($"spike").select($"rid")
      .collect().map(_.getLong(0)).toSet
    assert(spikes == Set(3L), s"expected only rid=3 flagged, got $spikes")
    // rate: exact deltas, NULL rate on a same-second pair.
    val same = Seq(("p", 10L, 1L, 100L), ("p", 10L, 2L, 150L))
      .toDF("pr", "t", "rid", "cents")
    val r = api.TimeSeries.rate(same, "pr", "t", "rid", $"cents")
      .head()
    assert(r.getLong(r.fieldIndex("delta_v")) == 50L &&
      r.isNullAt(r.fieldIndex("rate")),
      "same-second pair must keep exact delta but NULL rate")
    // resample zero-fills the series' empty bins over the global span.
    val rs = api.TimeSeries.resample(readings, "probe", "t", "temp", 60L)
    assert(rs.filter($"series" === "probe-B" && $"n" === 0L).count() == 2,
      "probe-B must get zero-filled bins across the global grid")
  }

  test("Curation audits and balanced sampling on an ad-hoc frame") {
    val people = Seq(
      ("NW", 30, "acme", 1L), ("NW", 30, "acme", 2L),   // k=2, l=1
      ("NW", 40, "acme", 3L),                           // k=1, l=1
      ("SE", 30, "acme", 4L), ("SE", 30, "globex", 5L)  // k=2, l=2
    ).toDF("region", "age_band", "employer", "pid")
    val ka = api.Curation.kAnonymity(people,
      Seq($"region", $"age_band"), k = 2)
      .orderBy($"k").collect()
    assert(ka.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 2L)), "k histogram wrong")
    val ld = api.Curation.lDiversity(people,
      Seq($"region", $"age_band"), $"employer", l = 2)
      .orderBy($"l").collect()
    // groups: (NW,30) l=1, (NW,40) l=1, (SE,30) l=2
    assert(ld.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
      .toSeq == Seq((1L, 2L, true), (2L, 1L, false)), "l histogram wrong")
    val kept = api.Curation.sampleBalanced(people, "region", "pid", cap = 2)
    assert(kept.columns.toSeq == people.columns.toSeq,
      "sampler must preserve the caller's columns")
    val perClass = kept.groupBy($"region").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perClass == Map("NW" -> 2L, "SE" -> 2L), s"cap broken: $perClass")
    // Determinism: same salt → same selection, regardless of layout.
    val again = api.Curation.sampleBalanced(
      people.repartition(7), "region", "pid", cap = 2)
    assertSameRows(kept, again, "balanced sample not layout-stable")
  }

  test("Graph ops on a hand-computable ad-hoc graph") {
    // K4 on nodes 1..4 plus a pendant 5—1: C(4,3)=4 triangles.
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L)).toDF("a", "b")
    val t = api.Graph.triangles(und, uCol = "a", vCol = "b").head()
    assert((t.getLong(0), t.getLong(1), t.getLong(2)) == ((5L, 7L, 4L)),
      s"K4+pendant: expected (5 nodes, 7 edges, 4 triangles), got $t")
    // Pagerank on the symmetrized graph: mass stays in the pool
    // (integer floors only leak downward) and the hub (node 1,
    // degree 4) must outrank the pendant (node 5, degree 1).
    val sym = und.select($"a".as("src"), $"b".as("dst"))
      .unionByName(und.select($"b".as("src"), $"a".as("dst")))
    val pr = api.Graph.pagerank(sym, iters = 10, mass = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pr.keySet == Set(1L, 2L, 3L, 4L, 5L), "node set lost")
    assert(pr.values.sum <= 1000000L, "integer pagerank created mass")
    assert(pr(1L) > pr(5L), "hub must outrank the pendant node")
    val dd = api.Graph.degreeDistribution(sym)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dd == Map(4L -> 1L, 3L -> 3L, 1L -> 1L),
      s"degree histogram wrong: $dd")
  }

  test("Events.sessionize splits on the gap threshold") {
    val ev = Seq(
      (7L, 0L, 1L), (7L, 100L, 2L),    // session 1
      (7L, 2000L, 3L),                 // gap 1900 >= 1800 → session 2
      (8L, 0L, 4L)
    ).toDF("uid", "t", "eid")
    val r = api.Events.sessionize(ev, "uid", "t", "eid", gapSec = 1800L)
      .orderBy($"user_id", $"sid").collect()
    assert(r.length == 3, s"expected 3 sessions, got ${r.length}")
    assert(r(0).getLong(2) == 2 && r(1).getLong(2) == 1,
      "entity 7 must split 2+1 across the gap")
  }

  test("VectorSearch.semanticDedup respects cell blocking and the " +
       "cosine gate") {
    val vecs = Seq(
      (11L, Array(1.0f, 0.1f, 0.0f, 0.5f), 0L),
      (12L, Array(2.0f, 0.2f, 0.0f, 1.0f), 0L),  // 2× vec 11: cos = 1
      (13L, Array(-1.0f, 5.0f, 0.0f, -0.5f), 0L), // unrelated direction
      (14L, Array(1.0f, 0.1f, 0.0f, 0.5f), 1L)   // = vec 11, OTHER cell
    ).toDF("img_id", "feat", "cl")
    val r = api.VectorSearch.semanticDedup(vecs, "img_id", "feat",
        cellCol = Some("cl"), minCos = 0.95, signBits = 4)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2)))
      .toMap
    assert(r(11L) == (11L, true), "canonical min-id survives")
    assert(r(12L) == (11L, false), "colinear vector collapses onto 11")
    assert(r(13L) == (13L, true), "unrelated vector is a kept singleton")
    // Identical vector in a DIFFERENT cell must NOT pair — blocking is
    // cell-scoped by construction (that is the scale contract).
    assert(r(14L) == (14L, true), "cross-cell pair must not form")
  }

  test("TextDedup.hammingDedup clusters within the distance ball and " +
       "rejects unsound knobs loudly") {
    val sigs = Seq(
      (21L, 0xFFL), (22L, 0xFEL),      // distance 1 → one cluster
      (23L, 0xF0F0L), (24L, 0x0F0FL)   // distance 16 from each other
    ).toDF("img", "phash")
    val r = api.TextDedup.hammingDedup(sigs, idCol = "img",
        hashCol = "phash", bits = 16, blocks = 4, maxDist = 3)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2)))
      .toMap
    assert(r(21L) == (21L, true) && r(22L) == (21L, false),
      s"near pair must collapse onto min id: $r")
    assert(r(23L) == (23L, true) && r(24L) == (24L, true),
      s"distant hashes stay singletons: $r")
    // maxDist >= blocks voids the pigeonhole completeness proof — the
    // API must refuse, not silently lose recall.
    intercept[IllegalArgumentException] {
      api.TextDedup.hammingDedup(sigs, idCol = "img",
        hashCol = "phash", bits = 16, blocks = 4, maxDist = 4)
    }
  }

  test("Graph.connectedComponents labels each node with its " +
       "component minimum") {
    val edges = Seq((2L, 1L), (2L, 3L), (8L, 7L), (3L, 2L))
      .toDF("from_n", "to_n")
    val r = api.Graph.connectedComponents(edges, "from_n", "to_n")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L),
      s"components wrong: $r")
  }

  test("Graph.jaccardTopK on a hand-computable membership frame, " +
       "with a binding hub cap") {
    // Nodes 1,2 share items {a,b} of unions {a,b,c}∪{a,b} → J(1,2) =
    // 2/3; node 3 shares only hub item h (held by ALL nodes) — with
    // hubCap=2 the hub is excluded, so 3 pairs with nobody.
    val m = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (1L, "h"),
      (2L, "a"), (2L, "b"), (2L, "h"),
      (3L, "z"), (3L, "h")
    ).toDF("who", "item")
    val r = api.Graph.jaccardTopK(m, "who", "item", hubCap = 2, k = 5)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r((1L, 1L)) == (2L, 2L, 666666L),
      s"J(1,2) must be floor(2/3 ppm): $r")
    assert(r((2L, 1L)) == (1L, 2L, 666666L), "symmetry")
    assert(!r.keySet.exists(_._1 == 3L),
      s"hub-only node must have no neighbors under the cap: $r")
    // Without the cap, the hub creates the pairs.
    val r2 = api.Graph.jaccardTopK(m, "who", "item", hubCap = 10, k = 5)
      .collect().map(x => (x.getLong(0), x.getLong(2))).toSet
    assert(r2.contains((3L, 1L)) && r2.contains((3L, 2L)),
      s"uncapped hub must connect node 3: $r2")
  }

  test("Warehouse.scd2 + scd2Merge: incremental == rebuild on an " +
       "ad-hoc change stream with foreign column names") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s"2024-02-0$s:00:00")
    // Entity 1: plan changes A→B pre-cutoff, →C post (open row closed,
    // plus an in-delta no-change row that must be dropped). Entity 2:
    // pre-cutoff only (untouched by the merge). Entity 3: brand-new
    // post-cutoff (versions start at 1).
    val rows = Seq(
      (1L, t("1 10"), 1L, "A"), (1L, t("1 11"), 2L, "B"),
      (2L, t("1 12"), 3L, "X"),
      (1L, t("3 09"), 4L, "C"), (1L, t("3 10"), 5L, "C"),
      (3L, t("3 11"), 6L, "Z")
    ).toDF("acct", "at", "seq", "plan")
    val cutoff = t("2 00")
    val hist = api.Warehouse.scd2(rows.filter($"at" < cutoff),
      "acct", "at", "seq", "plan")
    assert(hist.columns.toSeq == Seq("acct", "version", "plan",
      "valid_from", "valid_to", "is_current"))
    val merged = api.Warehouse.scd2Merge(hist,
      rows.filter($"at" >= cutoff), "acct", "at", "seq", "plan")
    val rebuilt = api.Warehouse.scd2(rows, "acct", "at", "seq", "plan")
    assertSameRows(merged, rebuilt, "scd2 merge vs rebuild")
    // The merge genuinely exercised all three entity shapes.
    val byAcct = merged.groupBy($"acct").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byAcct == Map(1L -> 3L, 2L -> 1L, 3L -> 1L),
      s"unexpected history shape: $byAcct")
    // Empty delta is the identity.
    assertSameRows(
      api.Warehouse.scd2Merge(hist, rows.filter(lit(false)),
        "acct", "at", "seq", "plan"),
      hist, "empty-delta merge identity")
  }

  test("TimeSeries.madOutliers flags only the wild reading on a " +
       "contaminated probe") {
    // 20 readings near 100 plus one stuck-at-999999: the median/MAD
    // gate must flag exactly the wild one (a mean-based 3σ threshold
    // is dragged by it — the reason this estimator exists).
    val probe = ((1 to 20).map(i => (i.toLong, "probeA", 100L + (i % 3)))
      :+ (21L, "probeA", 999999L)).toDF("rid", "sensor", "c")
    val r = api.TimeSeries.madOutliers(probe, "sensor", "rid", $"c")
    assert(r.count() == 21, "augment-style: every row scored")
    val flagged = r.filter($"outlier").select($"rid")
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(21L), s"must flag exactly the wild row: $flagged")
    val med = r.select($"med_c").distinct().collect().map(_.getLong(0))
    assert(med.length == 1 && med.head <= 102,
      s"median dragged by the contamination: ${med.toSeq}")
  }

  test("Curation.dsirTable/dsirScores separate an obvious target " +
       "slice on an ad-hoc corpus") {
    val docs = Seq(
      (1L, "good", "alpha beta gamma alpha"),
      (2L, "good", "alpha beta beta gamma"),
      (3L, "bad",  "delta epsilon zeta zeta"),
      (4L, "bad",  "delta delta epsilon zeta")
    ).toDF("id", "tag", "body")
    val table = api.Curation.dsirTable(docs, $"tag" === "good",
      textCol = "body", buckets = 64)
    assert(table.columns.toSet == Set("b", "share_ppm", "g_ppm"))
    val scored = api.Curation.dsirScores(docs, table, "id",
        textCol = "body", buckets = 64)
      .collect().map(x => x.getAs[Long]("id") ->
        (x.getAs[Long]("score"), x.getAs[Boolean]("selected"))).toMap
    // Disjoint vocabularies: target docs must score positive,
    // non-target negative, selection consistent with the sign.
    Seq(1L, 2L).foreach(id => assert(scored(id)._1 > 0 && scored(id)._2,
      s"target doc $id not positive: $scored"))
    Seq(3L, 4L).foreach(id => assert(scored(id)._1 < 0 && !scored(id)._2,
      s"non-target doc $id not negative: $scored"))
    // The table is exactly the fixed hash space or smaller (only
    // occupied buckets materialize), never corpus-sized.
    assert(table.count() <= 64, "feature table exceeds the hash space")
  }

  test("Warehouse.pitLookup enriches each fact with the version " +
       "current at ITS timestamp") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s"2024-02-0$s:00:00")
    val changes = Seq(
      (1L, t("1 10"), 1L, "A"), (1L, t("2 10"), 2L, "B"),
      (2L, t("1 12"), 3L, "X")
    ).toDF("acct", "at", "seq", "plan")
    val hist = api.Warehouse.scd2(changes, "acct", "at", "seq", "plan")
    def us(s: String) = t(s).getTime * 1000L
    val facts = Seq(
      (10L, 1L, us("1 09")),  // before acct 1's first change -> null
      (11L, 1L, us("1 15")),  // inside version A
      (12L, 1L, us("2 10")),  // exactly at the B change -> B
      (13L, 1L, us("3 00")),  // open current row -> B
      (14L, 3L, us("2 00"))   // unknown key -> null
    ).toDF("fid", "acct", "at_us")
    val got = api.Warehouse
      .pitLookup(facts, "acct", "at_us", hist, "acct", "plan")
      .select($"fid", $"plan").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(10L -> None, 11L -> Some("A"), 12L -> Some("B"),
      13L -> Some("B"), 14L -> None), s"pit lookup wrong: $got")
    // No row multiplication: one output row per fact.
    assert(api.Warehouse.pitLookup(facts, "acct", "at_us", hist,
      "acct", "plan").count() == 5)
  }

  test("Curation.weightedSample pressure and epochShards stability " +
       "on an ad-hoc frame") {
    val df = (1L to 400L).map(i =>
      (i, if (i % 2 == 0) 1000L else 10L)).toDF("id", "w")
    val sel = api.Curation.weightedSample(df, "id", "w", 50, "t")
    assert(sel.count() == 50)
    // Heavy rows (weight 1000) must dominate the selection.
    val heavy = sel.filter($"w" === 1000L).count()
    assert(heavy > 40, s"only $heavy/50 heavy rows selected — no " +
      "selection pressure")
    // epochShards: exhaustive partition, contiguous positions, and
    // reshard stability.
    val sh = api.Curation.epochShards(df, "id", 8)
    assert(sh.count() == 400)
    val bad = sh.groupBy($"shard")
      .agg(count(lit(1)).as("n"), max($"pos").as("mx"),
        countDistinct($"pos").as("nd"))
      .filter($"mx" =!= $"n" || $"nd" =!= $"n").count()
    assert(bad == 0, "positions are not a contiguous 1..n per shard")
    assertSameRows(sh, api.Curation.epochShards(
      df.repartition(13), "id", 8), "epochShards reshard stability")
  }

  test("TimeSeries.rollingMedian tracks the level through a spike") {
    // Readings near 100 with one 9999 spike: the width-5 rolling
    // median must never leave the [99, 101] band (the mean would
    // jump ~2000 while the spike is in frame).
    val rows = (1L to 12L).map(i =>
      ("probe", i, i, if (i == 6) 9999L else 99L + (i % 3)))
      .toDF("p", "t", "id", "v")
    val got = api.TimeSeries.rollingMedian(rows, "p", "t", "id", "v",
        width = 5)
      .orderBy($"t").collect()
      .map(r => (r.getLong(1), r.getLong(5), r.getLong(4)))
    assert(got.forall { case (t, med, _) => med >= 99L && med <= 101L },
      s"median left the level band: ${got.mkString(",")}")
    // Frames really ramp 1..5 then hold at 5.
    assert(got.map(_._3).toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L, 5L, 5L, 5L, 5L, 5L, 5L, 5L))
  }

  test("VectorSearch.mmrRerank prefers a diverse pick over a " +
       "redundant one on a hand-built shortlist") {
    // Query 1: candidate 100 is most relevant; 101 is nearly a
    // duplicate of 100 (sim .99) but slightly more relevant than 102
    // (independent, sim .1). Pure relevance ranks 101 second; MMR
    // must pick 102 second.
    val shortlist = Seq(
      (1L, 100L, 0.90), (1L, 101L, 0.80), (1L, 102L, 0.75)
    ).toDF("q_id", "c_id", "rel")
    val simPairs = Seq(
      (1L, 100L, 101L, 0.99), (1L, 100L, 102L, 0.10),
      (1L, 101L, 102L, 0.12))
    val sims = simPairs.toDF("q_id", "a", "b", "sim").unionByName(
      simPairs.map { case (q, a, b, s0) => (q, b, a, s0) }
        .toDF("q_id", "a", "b", "sim"))
    val got = api.VectorSearch.mmrRerank(shortlist, sims, 3)
      .orderBy($"pick").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._2) == Seq(100L, 102L, 101L),
      s"MMR order wrong: $got (want 100, 102, 101)")
    // Scores: pick1 = .7*.90; pick2 = .7*.75 - .3*.10.
    val scores = api.VectorSearch.mmrRerank(shortlist, sims, 3)
      .orderBy($"pick").collect().map(_.getDouble(3))
    assert(math.abs(scores(0) - 0.63) < 1e-12)
    assert(math.abs(scores(1) - (0.7 * 0.75 - 0.3 * 0.10)) < 1e-12)
  }
}
