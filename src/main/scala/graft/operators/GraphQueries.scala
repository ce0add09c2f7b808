package graft.operators

import graft.{QueryPack, Tables}
import org.apache.spark.sql.functions._

/** Graph / link-analysis operators (SURVEY.md §2.K extension, r7).
  *
  * `graph_pagerank` runs damped PageRank over the part↔supplier
  * bipartite graph mined from `lineitem` — the fact table IS the edge
  * list, which is exactly the 100-TB shape (link-graph quality signals
  * for training-data curation are computed from crawl fact tables the
  * same way). Joins/aggregates per iteration are keyed by node id
  * (high cardinality), the edge relation is built once and
  * session-cached (index-build accounting, like the dedup components
  * relation), and each iteration is one join + one aggregate — O(E)
  * per round with no global structure on any worker.
  *
  * Determinism (§7.4): the whole iteration is FIXED-POINT INTEGER
  * arithmetic — ranks are integers out of a 10^12 mass pool, each
  * contribution is `rank div outdeg` (integer floor division), damping
  * is `(in*85) div 100 + (base*15) div 100`. Integer sums are
  * order-free, so the result is bit-identical regardless of partition
  * count or engine: DuckDB replays the SAME ten iterations as an
  * unrolled CTE chain generated from one shared template. (A floating
  * PageRank would hash-mismatch: FP addition isn't associative and
  * shuffle order isn't stable.) Truncation loss from the integer
  * divisions only leaks mass out of the pool — it never breaks
  * cross-engine equality, which is the contract here.
  */
object GraphQueries extends QueryPack {

  /** Fixed synchronous iteration count (power iteration converges
    * geometrically; 10 rounds ≈ damping^10 < 0.2 residual — plenty to
    * rank, and a FIXED count is what makes the unrolled oracle and the
    * Spark loop provably identical). */
  val prIters = 10

  /** Total integer rank mass (10^12: enough head-room that per-node
    * ranks keep ~6 significant digits after the integer divisions). */
  val prMass = 1000000000000L

  /** graph_lpa rounds — fixed so the unrolled oracle and the Spark
    * loop are provably the same computation (the pagerank/BFS
    * discipline). 4 = enough mixing for labels to coarsen across the
    * bipartite 2-hop neighborhoods at every SF without betting on a
    * fixpoint synchronous LPA does not guarantee. */
  val lpaRounds = 4

  /** graph_jaccard hub cap: parts with more suppliers than this are
    * excluded before pair generation (binds at sf0.01+; sf0.001's max
    * part degree is 10, so the cap is a no-op there by construction). */
  val jaccHubCap = 35

  /** graph_jaccard_bucketed bucket count. Locally 32 (= cores, one
    * read task per bucket); on a 1000-executor cluster this is sized
    * to total cores (thousands) at the one-time membership write. */
  val jaccBuckets = 32

  /** graph_distance BFS rounds — fixed so the unrolled oracle and the
    * Spark loop are provably the same computation; 6 covers the
    * bipartite graph's diameter from the 10% seed set at every SF. */
  val bfsRounds = 6

  /** graph_kcore parameters. k=10 is the smallest degree bound that
    * actually peels the customer↔part purchase graph at every SF
    * (measured: 2/350 nodes drop at sf0.001, 10/3500 at sf0.01 —
    * non-vacuity law in R11dOpsSpec); 4 rounds = the measured
    * cascade depth (2 at every SF) + headroom, with the fixpoint
    * (round 4 == round 5) law-asserted so the FIXED unroll the
    * oracle needs is also provably the converged core. */
  val kcoreK = 10
  val kcoreRounds = 4

  /** Edge list: distinct (part, supplier) pairs from lineitem, both
    * directions (bipartite undirected); suppliers offset to their own
    * id space. Built once per (session, dir) — every consumer
    * (pagerank iterations, degree distribution, repeats) probes the
    * same cached relation. Partitioned by dst AT BUILD TIME so
    * pagerank's per-iteration aggregate reuses the partitioning (no
    * exchange on the big relation inside the loop) — the
    * one-big-shuffle-then-iterate layout that makes iterative graph
    * jobs viable at 100 TB. */
  private def edgeRel(s: org.apache.spark.sql.SparkSession,
                      dir: String) = {
    import s.implicits._
    graft.SessionCache.cached(s, s"pr.edges:$dir") {
      val e = Tables.load(s, dir, "lineitem")
        .select($"l_partkey".as("p"),
          ($"l_suppkey" + 1000000000L).as("sn"))
        .distinct()
      e.select($"p".as("src"), $"sn".as("dst"))
        .unionByName(e.select($"sn".as("src"), $"p".as("dst")))
        .repartition($"dst")
    }
  }

  /** Supplier co-supply projection (r8, extracted r14): suppliers
    * linked when they co-supply a part, hub parts (> 8 suppliers)
    * excluded BEFORE projection so edge emission stays linear in the
    * fact table. An index artifact (build-once-probe-many),
    * session-cached exactly like pagerank's edgeRel and the Hamming
    * signature indexes; the bench's cold column carries the build
    * cost. */
  private def projEdges(s: org.apache.spark.sql.SparkSession,
                        dir: String) = {
    import s.implicits._
    graft.SessionCache.cached(s, s"tri.edges:$dir") {
      val ps = Tables.load(s, dir, "lineitem")
        .select($"l_partkey".as("p"), $"l_suppkey".as("v")).distinct()
      val okParts = ps.groupBy($"p").agg(count(lit(1)).as("d"))
        .filter($"d" <= 8).select($"p")
      val pp = ps.join(okParts, "p")
      pp.as("x").join(pp.as("y"), "p")
        .filter($"x.v" < $"y.v")
        .select($"x.v".as("u"), $"y.v".as("v")).distinct()
    }
  }

  /** LPA's edge relation (r14): the MINHASH CANDIDATE-PAIR graph over
    * documents (TrainQueries' session-cached LSH pair relation),
    * DOUBLED and dst-partitioned. Graph choice matters twice over:
    * (1) LPA must run on a UNIPARTITE graph — synchronous label
    * propagation two-colors a bipartite one (measured on the
    * part↔supplier relation: within-community edges = 0, modularity
    * exactly −0.5, the textbook degeneracy); (2) it needs REAL
    * community structure — the TPC-H projections are uniform-random,
    * so they are either one dense blob (Q = 0) or empty under a hub
    * cap, while the near-dup candidate graph has exactly the cluster
    * structure community detection is FOR (dup clusters = communities;
    * LPA's count-voting is the soft counterpart of
    * dedup_minhash_cluster's connectivity components — a bridge doc
    * joins its majority side instead of merging both). */
  private def lpaEdges(s: org.apache.spark.sql.SparkSession,
                       dir: String) = {
    import s.implicits._
    graft.SessionCache.cached(s, s"lpa.edges:$dir") {
      val pr = TrainQueries.minhashPairRel(s, dir).select($"da", $"db")
      pr.select($"da".as("src"), $"db".as("dst"))
        .unionByName(pr.select($"db".as("src"), $"da".as("dst")))
        .repartition($"dst")
    }
  }

  /** LPA community labels as a session-cached index artifact (r14):
    * built once per (session, dir), consumed by graph_lpa AND
    * graph_modularity — at scale the label assignment is a written
    * table probed by every per-community consumer, the same
    * accounting as pagerank's rank vector. */
  private def lpaLabels(s: org.apache.spark.sql.SparkSession,
                        dir: String) =
    graft.SessionCache.cached(s, s"lpa.labels:$dir") {
      graft.api.Graph.labelPropagation(lpaEdges(s, dir), lpaRounds)
    }

  def queries: Seq[(String, Q)] = Seq(
    // Thin adapter over graft.api.Graph.pagerank (r8): the symmetric
    // edge relation comes from the session-cached edgeRel, and the
    // converged rank vector stays an INDEX artifact (at scale: a
    // quality-score table materialized once, joined everywhere) under
    // the same session-cache accounting as the dedup components.
    "graph_pagerank" -> ((s, dir) => {
      import s.implicits._
      val ranks = graft.SessionCache.cached(s, s"pr.ranks:$dir") {
        graft.api.Graph.pagerank(edgeRel(s, dir), prIters, prMass)
      }
      ranks.select($"node",
          when($"node" >= 1000000000L, "supplier").otherwise("part")
            .as("node_type"),
          $"outdeg", $"rank")
        .orderBy($"node")
    }),

    // Degree distribution of the same graph — the first sanity check
    // of any mined link graph (a heavy tail here is why pagerank and
    // skew salting exist at all). Probes the shared cached edge
    // relation; two stacked integer aggregates, shuffle width =
    // distinct (type, degree) pairs.
    "graph_degree_dist" -> ((s, dir) => {
      import s.implicits._
      edgeRel(s, dir)
        .groupBy($"src").agg(count(lit(1)).as("deg"))
        .select(when($"src" >= 1000000000L, "supplier")
          .otherwise("part").as("node_type"), $"deg")
        .groupBy($"node_type", $"deg")
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy($"node_type", $"deg")
    }),

    // Triangle counting (r8) over the supplier projection of the
    // part↔supplier graph (suppliers are linked when they co-supply a
    // part — the bipartite pagerank graph itself is triangle-free by
    // construction). The two scale decisions ARE the operator:
    //   1. Hub skip: parts supplied by > 8 suppliers are excluded
    //      before projection — a hub part emits O(d²) edges, and at
    //      crawl scale hub skipping (or sampling) is how projection
    //      graphs stay linear in the fact table. The cap is part of
    //      the operator's declared semantics and mirrored verbatim in
    //      the oracle.
    //   2. Degree-ordered orientation (compact-forward, Latapy 2008):
    //      each undirected edge points from its lower-(degree, id)
    //      endpoint, so every wedge is generated exactly once FROM
    //      the lower-degree vertex — join fanout is bounded by the
    //      oriented out-degree (≤ √(2m) on any graph), never by a hub
    //      supplier's full neighborhood. The oracle counts the same
    //      triangles with naive id-ordering — the per-triangle count
    //      is orientation-invariant, so cross-engine equality holds
    //      while the Spark plan keeps the skew-safe shape.
    // Output: one row (n_nodes, n_edges, n_triangles) — the single-row
    // aggregates combine by broadcast cross join.
    "graph_triangles" -> ((s, dir) => {
      import s.implicits._
      // Thin adapter over graft.api.Graph.triangles (r8) over the
      // shared session-cached projection.
      graft.api.Graph.triangles(projEdges(s, dir))
    }),

    // Neighborhood Jaccard similarity (r11c): top-5 most-similar
    // suppliers per supplier, where similarity is the Jaccard of the
    // suppliers' part sets |A∩B| / |A∪B| in exact integer ppm. The
    // structural-similarity primitive behind "find sources like this
    // one" curation queries over a mined link graph.
    //
    // Scale decisions (they ARE the operator, like graph_triangles):
    //   1. Candidate pairs come ONLY from co-occurrence on a shared
    //      part (self equi-join of the edge list on part) — never an
    //      all-pairs supplier join. Cost is Σ_p C(deg_p, 2), linear
    //      in edges × the per-part degree cap.
    //   2. Hub cap: parts with > 35 suppliers are excluded before
    //      pair generation (the cap binds at sf0.01: 27 hub parts),
    //      bounding the per-part fanout — the same hub-skip that
    //      keeps graph_triangles' projection linear. Degrees and the
    //      union term use the SAME capped edge set, so the reported
    //      value is the true Jaccard of the capped part sets; the
    //      cap is declared semantics, mirrored verbatim in the
    //      oracle.
    //   3. Per-supplier top-k (k=5, ties broken by neighbor id, so
    //      the cut is total) bounds the OUTPUT to 5·|suppliers| rows
    //      at any scale; the rank filter compiles to
    //      WindowGroupLimit, so each partition keeps only 5 rows
    //      before the final sort.
    "graph_jaccard" -> ((s, dir) => {
      import s.implicits._
      // The capped edge list is consumed three times in one plan
      // (both self-join sides + the degree table) — session-cached
      // like pagerank's edgeRel, or the fact table would be scanned
      // and re-distinct-ed per consumer (the uncached plan measured
      // 12 FileScans; at 100 TB this relation is a written table).
      // Thin adapter over graft.api.Graph.jaccardTopK — the cap+cache
      // happen once here (session-scoped), the pair/rank algebra is
      // the public function, so the DuckDB oracle proves the API.
      val ce = graft.SessionCache.cached(s, s"jacc.edges:$dir") {
        jaccMembership(s, dir)
      }
      graft.api.Graph.jaccardTopKOnCapped(ce, 5)
        .select($"node".as("s1"), $"rk", $"other".as("s2"),
          $"common", $"jacc_ppm")
        .orderBy($"s1", $"rk")
    }),

    // Bucketed-membership jaccard (r13): the 1000-executor LAYOUT the
    // cached variant's comment promises, shipped and measured — the
    // capped membership is WRITTEN once as a p-bucketed, per-bucket
    // p-sorted table (the sink_bucketed pattern; repartition(buckets,
    // p) first so each bucket is exactly one file and the persisted
    // sort order is credited), so BOTH sides of the pair self-join
    // read pre-partitioned, pre-sorted bucket files: the join subtree
    // is scan → SMJ with ZERO exchange and ZERO sort (law-asserted in
    // R13OpsSpec). At 100 TB the co-occurrence relation is a written,
    // reused table anyway; bucketing it by the join key at write time
    // deletes the biggest shuffle of every downstream consumer. A
    // LAYOUT variant, not a semantics variant: same output, same
    // oracle SQL as graph_jaccard (equality law-asserted).
    "graph_jaccard_bucketed" -> ((s, dir) => {
      import s.implicits._
      // Bucket count is a session knob (r14): locally it defaults to
      // jaccBuckets = 32 (= cores, one read task per bucket), but the
      // SMJ's parallelism over a bucketed table IS the bucket count —
      // at 100x data, 32 single-file buckets cap the join at 32-way
      // however wide the cluster. On a real cluster the one-time
      // membership write buckets by TOTAL CORES; the knob lets the
      // scale harness measure exactly that (spark.graft.jaccard
      // .buckets=320 at the 100x staging = the cluster-sized layout).
      val buckets = s.conf.getOption("spark.graft.jaccard.buckets")
        .map(_.toInt).getOrElse(jaccBuckets)
      // Tag = sanitized basename + full-path hash (r13 ADVICE): two
      // dirs whose basenames sanitize identically ('sf0.01' vs
      // 'sf0_01') must not collide on the metastore table name — the
      // second staging would silently rewrite the table the first
      // dir's still-cached query reads. Mirrors the SessionCache key,
      // which already uses the full dir. Bucket count joins the tag
      // and the memo key for the same reason.
      val tag = new java.io.File(dir).getName
        .replaceAll("[^A-Za-z0-9]", "_") +
        "_" + f"${dir.hashCode & 0xffffffffL}%08x" +
        (if (buckets == jaccBuckets) "" else s"_b$buckets")
      graft.SessionCache.cached(s, s"jacc.bucketed:$dir:$buckets",
          persist = false) {
        s.sql(s"DROP TABLE IF EXISTS jacc_mem_$tag")
        jaccMembership(s, dir)
          .repartition(buckets, $"p")
          .write.mode("overwrite")
          .option("path", s"target/roundtrip/${tag}_jacc_mem")
          .bucketBy(buckets, "p").sortBy("p", "sup")
          .saveAsTable(s"jacc_mem_$tag")
        s.range(1).toDF() // memo token: the artifact is the table
      }
      graft.api.Graph.jaccardTopKOnCapped(
          s.table(s"jacc_mem_$tag").hint("merge"), 5)
        .select($"node".as("s1"), $"rk", $"other".as("s2"),
          $"common", $"jacc_ppm")
        .orderBy($"s1", $"rk")
    }),

    // Multi-source BFS distance (r11c): min-hop distance from the 10%
    // seed-supplier set over the same session-cached bipartite graph
    // — the reachability/propagation primitive (contamination spread,
    // trust distance, crawl-frontier depth). Thin adapter over
    // graft.api.Graph.bfsDistances: 6 synchronous Bellman-Ford
    // rounds, each one equi-join + one min-aggregate on the node key;
    // min is order-free so the result is bit-identical across
    // engines, and the FIXED round count is what lets the DuckDB
    // oracle unroll the exact same iterations (the pagerank
    // discipline with min for sum). Unreached nodes are absent by
    // declared semantics.
    "graph_distance" -> ((s, dir) => {
      import s.implicits._
      val ed = edgeRel(s, dir)
      val seeds = ed.select($"src".as("node")).distinct()
        .filter($"node" >= 1000000000L &&
          ($"node" - 1000000000L) % 10 === 0)
      graft.api.Graph.bfsDistances(ed, seeds, bfsRounds)
        .select($"node",
          when($"node" >= 1000000000L, "supplier").otherwise("part")
            .as("node_type"),
          $"dist")
        .orderBy($"node")
    }),

    // Degree assortativity (r11d; Newman 2002) — does the graph wire
    // hubs to hubs (r > 0) or hubs to leaves (r < 0)? The one-number
    // mixing diagnostic read before trusting degree-based sampling
    // or pruning decisions. Pearson correlation of (deg(src),
    // deg(dst)) over the DOUBLED edge relation. r13 restructure
    // (r12 verdict: the old two deg-joins of the edge relation flip
    // to full edge shuffles once deg outgrows autoBroadcast — 41.9×
    // per-decade at 100×): the symmetric relation makes n, Σx, Σx²
    // (= Σy, Σy²) pure DEGREE moments — node u appears as src exactly
    // d(u) times, so n = Σd, sx = Σd², sxx = Σd³ — computed from the
    // node-sized deg table with NO edge join. Only Σxy needs the
    // adjacency, and it is the pagerank matvec: EXPLICIT broadcast of
    // the node-sized degree vector (a shuffle join of the cached edge
    // relation re-exchanges AND sorts it — measured 53.8 s / 37×
    // per-decade at 100× before this; the BHJ streams the cached
    // dst-partitioned edges with no edge exchange and no sort), a
    // map-side-combined groupBy dst into neighbor-degree sums
    // T(v) = Σ_{u∈N(v)} d(u), then sxy = Σ_v d(v)·T(v) via a second
    // broadcast of deg onto the node-sized T. The loud size assert
    // below (r12 verdict item 3) bounds the broadcast: past ~10^8
    // nodes the degree vector outgrows a sane broadcast and the op
    // must move to a shuffle matvec — fail with that instruction, not
    // an executor OOM.
    // Power sums stay in DECIMAL(38,0) with centsLong's loud bounded
    // BIGINT cast (r11 ADVICE); a DECIMAL(38,0) sum that itself
    // overflows yields NULL in non-ANSI Spark, so the post-join
    // n>0 && NULL guard below raises loudly instead of silently
    // forwarding NULL where the DuckDB oracle would error (r12
    // ADVICE).
    "graph_assortativity" -> ((s, dir) => {
      import s.implicits._
      val ed = edgeRel(s, dir)
      val dd = org.apache.spark.sql.types.DecimalType(12, 0)
      // deg is referenced three times (moments, edge join, final
      // node×node join); session-cache the NODE-sized table so the
      // edge-sized groupBy runs once, not per reference (at scale: a
      // degree table materialized once, joined everywhere).
      val deg = graft.SessionCache.cached(s, s"assort.deg:$dir") {
        ed.groupBy($"src").agg(count(lit(1)).as("d"))
      }
      // Broadcast-size assert: one count over the CACHED node table
      // (the moments aggregate scans it anyway). 10^8 nodes ≈ 1.6 GB
      // of (id, deg) — the honest ceiling for a broadcast vector.
      val nNodes = deg.count()
      require(nNodes <= 100000000L,
        s"graph_assortativity: $nNodes nodes — the degree vector no " +
          "longer broadcasts; rework sxy to a shuffle matvec " +
          "(partition deg by the edge layout's dst key)")
      val xd = $"d".cast(dd)
      val mom = deg.agg(
        sum($"d").as("n"),
        graft.Det.centsLong(sum(xd * xd), 1, "sx"),
        graft.Det.centsLong(sum(xd * xd * xd), 1, "sxx"))
      val nbr = ed
        .join(broadcast(deg.select($"src".as("a"), $"d".cast(dd).as("xd2"))),
          $"src" === $"a")
        .groupBy($"dst").agg(sum($"xd2").as("snbr"))
      val sxy = nbr
        .join(broadcast(deg.select($"src".as("b"), $"d".cast(dd).as("yd"))),
          $"dst" === $"b")
        .agg(graft.Det.centsLong(sum($"snbr" * $"yd"), 1, "sxy"))
      def nn(c: org.apache.spark.sql.Column, nm: String) =
        when($"n" > 0 && c.isNull, raise_error(lit(
          s"graph_assortativity: $nm DECIMAL(38,0) power-sum overflow")))
          .otherwise(c).as(nm)
      // sy = sx and syy = sxx exactly (doubled relation), so the
      // oracle's five-sum IEEE expression evaluates bit-identically
      // on the three sums computed here.
      mom.crossJoin(broadcast(sxy))
        .select($"n", nn($"sx", "sx"), nn($"sxx", "sxx"),
          nn($"sxy", "sxy"))
        .selectExpr("n", "sx", "sx AS sy",
          "round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)" +
            " / (sqrt(CAST(n AS DOUBLE) * sxx" +
            " - CAST(sx AS DOUBLE) * sx)" +
            " * sqrt(CAST(n AS DOUBLE) * sxx" +
            " - CAST(sx AS DOUBLE) * sx)), 12) AS assort_r")
    }),

    // Synchronous label propagation (r14): community labels over the
    // doubled minhash candidate-pair graph (lpaEdges — near-duplicate
    // document clusters), NOT the supplier co-supply projection — the
    // cheap community signal read before per-community sampling/mixing
    // decisions (domain clusters in a crawl corpus). A UNIPARTITE
    // graph is required: synchronous LPA two-colors a bipartite graph
    // (see lpaEdges for the full argument). Thin adapter over
    // graft.api.Graph.labelPropagation: 4 fixed synchronous rounds,
    // each ONE node-sized broadcast + two aggregates both satisfied by
    // the cached edges' dst partitioning (dst prefixes both grouping
    // keys) — zero shuffle exchange per round (law-asserted in
    // R14OpsSpec); most-frequent-neighbor-label with min tie-break is
    // a total order, so the result is bit-identical across engines
    // and the FIXED round count lets DuckDB unroll the identical
    // iterations.
    "graph_lpa" -> ((s, dir) => {
      import s.implicits._
      lpaLabels(s, dir)
        .select($"node", $"lbl".as("comm"))
        .orderBy($"node")
    }),

    // Newman modularity (r14) of the LPA community assignment — the
    // one-number answer to "did communities actually form?", read
    // before acting on graph_lpa's labels (per-community sampling,
    // mixing weights). Q = within/(2m) − Σ_c D_c²/(2m)² over the
    // DOUBLED edge relation (2m = |ed| rows, D_c = Σ degrees in c).
    // All three inputs are exact integers: `within` counts edges
    // whose endpoints share a label (two broadcasts of the node-sized
    // label vector onto the cached dst-partitioned edges — the matvec
    // discipline, zero edge exchange), D_c sums are node-sized
    // aggregates, and Q is ONE fixed IEEE expression over the exact
    // sums, byte-identical in the oracle (the assortativity
    // discipline). Squared degree-mass stays bounded: Σ D_c² ≤ (2m)²
    // = 5.8e16 at 100x, inside BIGINT with centsLong's loud guard.
    "graph_modularity" -> ((s, dir) => {
      import s.implicits._
      val ed = lpaEdges(s, dir)
      val lab = lpaLabels(s, dir)
      val dd = org.apache.spark.sql.types.DecimalType(19, 0)
      val m2 = ed.agg(count(lit(1)).as("m2"))
      val within = ed
        .join(broadcast(lab.select($"node".as("sa"), $"lbl".as("la"))),
          $"src" === $"sa")
        .join(broadcast(lab.select($"node".as("sb"), $"lbl".as("lb"))),
          $"dst" === $"sb")
        .filter($"la" === $"lb")
        .agg(count(lit(1)).as("within"))
      val deg = ed.groupBy($"src").agg(count(lit(1)).as("d"))
      val dc = deg
        .join(broadcast(lab.select($"node".as("sc"), $"lbl")),
          $"src" === $"sc")
        .groupBy($"lbl").agg(sum($"d").as("dsum"))
      val dsq = dc.agg(graft.Det.centsLong(
        sum($"dsum".cast(dd) * $"dsum".cast(dd)), 1, "dsq"))
      m2.crossJoin(broadcast(within)).crossJoin(broadcast(dsq))
        .selectExpr("m2", "within", "dsq",
          "round((CAST(within AS DOUBLE) * CAST(m2 AS DOUBLE)" +
            " - CAST(dsq AS DOUBLE))" +
            " / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 12)" +
            " AS modularity_q")
    }),

    // k-core peel (r11d) over the customer↔part PURCHASE graph (the
    // second bipartite graph the fact tables hold — who-buys-what,
    // with real degree variance from order counts; the part↔supplier
    // graph is too uniform to cascade). Thin adapter over
    // graft.api.Graph.kcore: 4 synchronous drop-degree-<k rounds,
    // each one count-aggregate + two survivor equi-joins — O(E) per
    // round, lineage truncated per round; the SHRINKING-fixpoint dual
    // of graph_distance's growing one. The FIXED round count is what
    // the unrolled DuckDB oracle replays; the fixpoint (round 4 ==
    // round 5) and a brute-force sequential peel are law-asserted in
    // R11dOpsSpec. Output: surviving nodes with their in-core degree.
    "graph_kcore" -> ((s, dir) => {
      import s.implicits._
      val ed = graft.SessionCache.cached(s, s"kcore.edges:$dir") {
        kcoreEdges(s, dir)
      }
      graft.api.Graph.kcore(ed, kcoreK, kcoreRounds)
        .select($"node",
          when($"node" >= 2000000000L, "part").otherwise("customer")
            .as("node_type"),
          $"deg")
        .orderBy($"node")
    }))

  /** The capped part↔supplier co-membership relation — graph_jaccard's
    * input, extracted (r18) so BOTH layout variants AND the
    * ScaleBench per-unit denominator (api.Graph.jaccardCandidateUnits
    * over this exact relation) share one definition. */
  private[graft] def jaccMembership(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val e = Tables.load(s, dir, "lineitem")
      .select($"l_partkey".as("p"), $"l_suppkey".as("sup")).distinct()
    val nonHub = e.groupBy($"p").agg(count(lit(1)).as("pd"))
      .filter($"pd" <= jaccHubCap).select($"p")
    e.join(nonHub, "p")
  }

  /** graph_kcore's doubled customer↔part edge relation, extracted
    * (r18) for the same reason: the ScaleBench per-unit denominator
    * (api.Graph.kcoreWorkUnits) must count work over EXACTLY the
    * relation the timed key peels. */
  private[graft] def kcoreEdges(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val b = Tables.load(s, dir, "lineitem")
      .join(Tables.load(s, dir, "orders"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("c"),
        ($"l_partkey" + 2000000000L).as("p"))
      .distinct()
    b.select($"c".as("src"), $"p".as("dst"))
      .unionByName(b.select($"p".as("src"), $"c".as("dst")))
  }

  /** The ten unrolled iterations, generated from the same constants as
    * the Spark loop so the two engines cannot drift. MATERIALIZED
    * (r11, same cure as DedupCluster.closureSql): DuckDB inlines
    * plain CTEs per reference, so the shared `ed`/`deg` relations
    * re-execute inside every unrolled round and the one-pipeline plan
    * spilled >79 GB at the sf1 staging (12M edges × 10 rounds);
    * materialized, each relation computes once and the whole chain
    * runs in ~38 s there. */
  private val prChain: String = (1 to prIters).map { i =>
    s"""r$i AS MATERIALIZED (SELECT deg.src AS node, deg.outdeg,
       |    ((CAST(t.in_sum AS BIGINT) * 85) // 100)
       |      + ((($prMass // nn.n_nodes) * 15) // 100) AS rank
       |  FROM (SELECT ed.dst, SUM(p.rank // p.outdeg) AS in_sum
       |        FROM ed JOIN r${i - 1} p ON p.node = ed.src
       |        GROUP BY ed.dst) t
       |  JOIN deg ON deg.src = t.dst
       |  CROSS JOIN nn)""".stripMargin
  }.mkString(",\n")

  /** The unrolled BFS rounds, generated from the same constant as the
    * Spark loop (pagerank's shared-template discipline). */
  private val bfsChain: String = (1 to bfsRounds).map { i =>
    s"""b$i AS MATERIALIZED (SELECT node, min(dist) AS dist FROM (
       |    SELECT node, dist FROM b${i - 1}
       |    UNION ALL
       |    SELECT ed.dst AS node, p.dist + 1 AS dist
       |    FROM ed JOIN b${i - 1} p ON p.node = ed.src)
       |  GROUP BY node)""".stripMargin
  }.mkString(",\n")

  /** LPA's graph, oracle-side: the agreement-gated minhash pair list
    * (TrainQueries.minhashGatedCtes — the EXACT prefix the
    * dedup_minhash_cluster oracle composes, so the pair semantics
    * cannot drift), doubled — shared by the graph_lpa and
    * graph_modularity oracles. */
  private val lpaEdgesSql: String =
    s"""${TrainQueries.minhashGatedCtes},
       |ed AS MATERIALIZED (SELECT da AS src, db AS dst FROM gated
       |       UNION ALL SELECT db, da FROM gated)""".stripMargin

  /** The unrolled LPA rounds, generated from the same constant as the
    * Spark loop (the bfsChain discipline). The window argmax (count
    * DESC, label ASC, rk = 1) is the oracle-side spelling of Spark's
    * max(struct(c, -lbl)) — both are the same total order. */
  private val lpaChain: String = (1 to lpaRounds).map { i =>
    s"""l$i AS MATERIALIZED (SELECT node, lbl FROM (
       |    SELECT ed.dst AS node, p.lbl, count(*) AS c,
       |      row_number() OVER (PARTITION BY ed.dst
       |        ORDER BY count(*) DESC, p.lbl) AS rk
       |    FROM ed JOIN l${i - 1} p ON p.node = ed.src
       |    GROUP BY ed.dst, p.lbl) WHERE rk = 1)""".stripMargin
  }.mkString(",\n")

  /** The unrolled peel rounds, generated from the same constants as
    * the Spark loop (the bfsChain discipline; MATERIALIZED so each
    * round computes once — the unrolled tree references its
    * predecessor three times per round). */
  private val kcoreChain: String = (1 to kcoreRounds).map { i =>
    s"""k$i AS MATERIALIZED (SELECT src FROM e${i - 1}
       |  GROUP BY src HAVING count(*) >= $kcoreK),
       |e$i AS MATERIALIZED (SELECT e.src, e.dst FROM e${i - 1} e
       |  JOIN k$i a ON e.src = a.src
       |  JOIN k$i b ON e.dst = b.src)""".stripMargin
  }.mkString(",\n")

  /** ce/pr are AS MATERIALIZED: DuckDB 1.0 inlines CTEs at every
    * reference (ce 3x, pr 2x), and at the 100x staging the doubled
    * pair self-join spilled past the host's free disk. Execution
    * hint only — same relation, sf0.01 oracle hash unchanged. */
  private val jaccardOracleSql: String =
    s"""WITH e AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS sup
       |  FROM lineitem),
       |nh AS (SELECT p FROM e GROUP BY p HAVING count(*) <= $jaccHubCap),
       |ce AS MATERIALIZED (SELECT e.p, e.sup FROM e JOIN nh USING (p)),
       |deg AS (SELECT sup, count(*) AS deg FROM ce GROUP BY sup),
       |pr AS MATERIALIZED (
       |  SELECT a.sup AS s1, b.sup AS s2, count(*) AS common
       |  FROM ce a JOIN ce b ON a.p = b.p AND a.sup < b.sup
       |  GROUP BY 1, 2),
       |sym AS (SELECT s1, s2, common FROM pr
       |  UNION ALL SELECT s2, s1, common FROM pr),
       |j AS (SELECT s1, s2, common,
       |    common * 1000000 // (d1.deg + d2.deg - common) AS jacc_ppm
       |  FROM sym
       |  JOIN deg d1 ON d1.sup = sym.s1
       |  JOIN deg d2 ON d2.sup = sym.s2),
       |r AS (SELECT s1, s2, common, jacc_ppm, row_number() OVER (
       |    PARTITION BY s1 ORDER BY jacc_ppm DESC, s2) AS rk FROM j)
       |SELECT s1, rk, s2, common, jacc_ppm FROM r WHERE rk <= 5
       |ORDER BY s1, rk""".stripMargin

  def oracle: Seq[(String, String)] = Seq(
    "graph_assortativity" ->
      """WITH e AS (SELECT DISTINCT l_partkey AS p,
        |    1000000000 + l_suppkey AS sn FROM lineitem),
        |ed AS (SELECT p AS src, sn AS dst FROM e
        |       UNION ALL SELECT sn, p FROM e),
        |deg AS (SELECT src, count(*) AS d FROM ed GROUP BY src),
        |j AS (SELECT a.d AS x, b.d AS y FROM ed
        |  JOIN deg a ON ed.src = a.src
        |  JOIN deg b ON ed.dst = b.src),
        |g AS (SELECT count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM j)
        |SELECT n, sx, sy,
        |  round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / (sqrt(CAST(n AS DOUBLE) * sxx
        |    - CAST(sx AS DOUBLE) * sx)
        |    * sqrt(CAST(n AS DOUBLE) * syy
        |    - CAST(sy AS DOUBLE) * sy)), 12) AS assort_r
        |FROM g ORDER BY n""".stripMargin,

    "graph_kcore" ->
      s"""WITH b AS MATERIALIZED (SELECT DISTINCT o_custkey AS c,
         |    2000000000 + l_partkey AS p
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |e0 AS MATERIALIZED (SELECT c AS src, p AS dst FROM b
         |       UNION ALL SELECT p, c FROM b),
         |$kcoreChain
         |SELECT src AS node,
         |  CASE WHEN src >= 2000000000 THEN 'part'
         |       ELSE 'customer' END AS node_type,
         |  count(*) AS deg
         |FROM e$kcoreRounds GROUP BY src ORDER BY node""".stripMargin,

    "graph_distance" ->
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS p,
         |    1000000000 + l_suppkey AS sn FROM lineitem),
         |ed AS MATERIALIZED (SELECT p AS src, sn AS dst FROM e
         |       UNION ALL SELECT sn, p FROM e),
         |b0 AS (SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS dist
         |  FROM ed
         |  WHERE src >= 1000000000 AND (src - 1000000000) % 10 = 0),
         |$bfsChain
         |SELECT node,
         |  CASE WHEN node >= 1000000000 THEN 'supplier'
         |       ELSE 'part' END AS node_type,
         |  dist
         |FROM b$bfsRounds ORDER BY node""".stripMargin,

    "graph_lpa" ->
      s"""WITH $lpaEdgesSql,
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM ed),
         |$lpaChain
         |SELECT node, lbl AS comm
         |FROM l$lpaRounds ORDER BY node""".stripMargin,

    "graph_modularity" ->
      s"""WITH $lpaEdgesSql,
         |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM ed),
         |$lpaChain,
         |lab AS MATERIALIZED (SELECT node, lbl FROM l$lpaRounds),
         |m2 AS (SELECT count(*) AS m2 FROM ed),
         |w AS (SELECT count(*) AS within FROM ed
         |  JOIN lab a ON ed.src = a.node
         |  JOIN lab b ON ed.dst = b.node AND a.lbl = b.lbl),
         |deg AS (SELECT src, count(*) AS d FROM ed GROUP BY src),
         |dc AS (SELECT a.lbl, sum(deg.d) AS dsum FROM deg
         |  JOIN lab a ON deg.src = a.node GROUP BY a.lbl),
         |s AS (SELECT CAST(sum(dsum * dsum) AS BIGINT) AS dsq FROM dc)
         |SELECT m2, within, dsq,
         |  round((CAST(within AS DOUBLE) * CAST(m2 AS DOUBLE)
         |    - CAST(dsq AS DOUBLE))
         |    / (CAST(m2 AS DOUBLE) * CAST(m2 AS DOUBLE)), 12)
         |    AS modularity_q
         |FROM m2, w, s""".stripMargin,

    "graph_jaccard" -> jaccardOracleSql,
    // Identical SQL by construction: the bucketed key is a physical
    // LAYOUT variant of graph_jaccard, so the oracle proves both
    // produce the same relation.
    "graph_jaccard_bucketed" -> jaccardOracleSql,

    "graph_triangles" ->
      """WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS v
        |  FROM lineitem),
        |ok AS (SELECT p FROM ps GROUP BY p HAVING count(*) <= 8),
        |pp AS (SELECT ps.p, ps.v FROM ps JOIN ok USING (p)),
        |ed AS (SELECT DISTINCT x.v AS u, y.v AS v
        |  FROM pp x JOIN pp y ON x.p = y.p AND x.v < y.v),
        |tri AS (SELECT count(*) AS n_triangles
        |  FROM ed e1
        |  JOIN ed e2 ON e1.v = e2.u
        |  JOIN ed e3 ON e3.u = e1.u AND e3.v = e2.v),
        |nn AS (SELECT count(DISTINCT n) AS n_nodes FROM
        |  (SELECT u AS n FROM ed UNION ALL SELECT v FROM ed)),
        |ne AS (SELECT count(*) AS n_edges FROM ed)
        |SELECT n_nodes, n_edges, n_triangles FROM nn, ne, tri""".stripMargin,

    "graph_pagerank" ->
      s"""WITH e AS MATERIALIZED (SELECT DISTINCT l_partkey AS p,
         |    1000000000 + l_suppkey AS sn FROM lineitem),
         |ed AS MATERIALIZED (SELECT p AS src, sn AS dst FROM e
         |       UNION ALL SELECT sn, p FROM e),
         |deg AS MATERIALIZED (SELECT src, count(*) AS outdeg
         |  FROM ed GROUP BY src),
         |nn AS MATERIALIZED (SELECT count(*) AS n_nodes FROM deg),
         |r0 AS MATERIALIZED (SELECT src AS node, outdeg,
         |    $prMass // n_nodes AS rank
         |  FROM deg CROSS JOIN nn),
         |$prChain
         |SELECT node,
         |  CASE WHEN node >= 1000000000 THEN 'supplier'
         |       ELSE 'part' END AS node_type,
         |  outdeg, rank
         |FROM r$prIters ORDER BY node""".stripMargin,

    "graph_degree_dist" ->
      """WITH e AS (SELECT DISTINCT l_partkey AS p,
        |    l_suppkey + 1000000000 AS sn FROM lineitem),
        |ed AS (SELECT p AS src, sn AS dst FROM e
        |  UNION ALL SELECT sn, p FROM e),
        |d AS (SELECT src, count(*) AS deg FROM ed GROUP BY src)
        |SELECT CASE WHEN src >= 1000000000 THEN 'supplier'
        |    ELSE 'part' END AS node_type,
        |  deg, count(*) AS n_nodes
        |FROM d GROUP BY node_type, deg
        |ORDER BY node_type, deg""".stripMargin)
}
