package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable link-analysis building blocks over a caller-supplied
  * DIRECTED edge frame — the public surface behind the oracled
  * `graph_*` keys (SURVEY.md §2.K). Determinism (§7.4): the pagerank
  * iteration is FIXED-POINT INTEGER arithmetic (integer floor
  * divisions, order-free integer sums), so results are bit-identical
  * regardless of partition count or engine.
  *
  * Scale notes: callers should pre-partition `edges` by dst and cache
  * it when iterating (the keyed queries do, via SessionCache); the
  * rank vector broadcasts here (node-dimension relation) — at
  * billion-node scale it would co-partition with edges on node id
  * instead, same dataflow.
  */
object Graph {

  /** Damped PageRank over directed (src, dst) edges, `iters` rounds of
    * synchronous power iteration on an integer mass pool. Every node
    * must have at least one in-edge for the inner join to keep the
    * full node set (symmetrize the edge frame first if not — the keyed
    * queries do). Damping is d=0.85 expressed exactly as integer
    * *85/100 and *15/100 floors. Output: (node, outdeg, rank). */
  def pagerank(edges: DataFrame, iters: Int = 10,
      mass: Long = 1000000000000L,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nTot = deg.agg(count(lit(1)).as("n_nodes"))
    var r = deg.crossJoin(broadcast(nTot))
      .select(col("src").as("node"), col("outdeg"), col("n_nodes"),
        expr(s"${mass}L div n_nodes").as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(broadcast(r.select(col("node"),
          expr("rank div outdeg").as("c"))), col("src") === col("node"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      r = deg.crossJoin(broadcast(nTot))
        .join(broadcast(contrib), col("src") === col("dst"))
        .select(col("src").as("node"), col("outdeg"), col("n_nodes"),
          expr(s"((in_sum * 85) div 100) + " +
            s"(((${mass}L div n_nodes) * 15) div 100)").as("rank"))
    }
    r.select(col("node"), col("outdeg"), col("rank"))
  }

  /** Out-degree histogram: (deg, n_nodes) — the first sanity check of
    * any mined link graph. Two stacked integer aggregates. */
  def degreeDistribution(edges: DataFrame, srcCol: String = "src")
      : DataFrame =
    edges.groupBy(col(srcCol).as("node"))
      .agg(count(lit(1)).as("deg"))
      .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))

  /** Triangle count over an UNDIRECTED edge frame given as unique
    * (u, v) pairs with u < v. Degree-ordered compact-forward
    * orientation (Latapy 2008): each edge points from its lower-
    * (degree, id) endpoint, so wedge fanout is bounded by the oriented
    * out-degree (≤ √(2m)), never a hub's full neighborhood. The count
    * is orientation-invariant. Output: one row (n_nodes, n_edges,
    * n_triangles). */
  def triangles(edges: DataFrame, uCol: String = "u",
      vCol: String = "v"): DataFrame = {
    val ed = edges.select(col(uCol).as("u"), col(vCol).as("v"))
    val deg = ed.select(col("u").as("n"))
      .unionAll(ed.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val or = ed
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
    val tri = or.as("e1")
      .join(or.as("e2"), col("e1.t") === col("e2.s"))
      .join(or.as("e3"),
        col("e1.s") === col("e3.s") && col("e2.t") === col("e3.t"))
      .agg(count(lit(1)).as("n_triangles"))
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
    val ne = ed.agg(count(lit(1)).as("n_edges"))
    nn.crossJoin(ne).crossJoin(tri)
  }

  /** Connected components over an UNDIRECTED edge frame (direction is
    * ignored): min-label propagation with pointer jumping to the
    * unique fixpoint — each node labeled with its component's minimum
    * node id. The same driver-iterated fixpoint behind every dedup
    * clustering key (DedupCluster.components: one equi-join + min-agg
    * per round, per-round lineage truncation, O(log diameter) rounds
    * via path halving). Node ids must be numeric (the convergence
    * probe sums labels). Output: (node, comp) — only nodes that
    * appear in at least one edge; left-join and coalesce to cover
    * isolated nodes from your own node relation. */
  def connectedComponents(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame =
    graft.operators.DedupCluster.components(
        edges.select(col(srcCol).as("da"), col(dstCol).as("db")))
      .select(col("doc_id").as("node"), col("comp"))

  /** Multi-source BFS: min-hop distance from a seed set over a
    * DIRECTED edge frame, `rounds` synchronous Bellman-Ford
    * relaxations (distance values are exact integers; min is
    * order-free, so the result is bit-identical across partitionings
    * and engines — the pagerank determinism argument with min for
    * sum). A node unreached within `rounds` is ABSENT from the
    * output — callers pick rounds ≥ the diameter they care about;
    * a fixed round count is what makes the unrolled DuckDB oracle
    * provably identical to this loop. Each round is one equi-join +
    * one min-aggregate on the node key — O(E) per round, no global
    * structure. Output: (node, dist). */
  def bfsDistances(edges: DataFrame, seeds: DataFrame, rounds: Int,
      srcCol: String = "src", dstCol: String = "dst",
      seedCol: String = "node"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    var d = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L))
    for (_ <- 1 to rounds) {
      // EXPLICIT broadcast of the node-sized distance vector (r13,
      // the assortativity lesson measured at 100x: without it the
      // relax join flips to SMJ past autoBroadcast and re-exchanges
      // AND sorts the edge relation EVERY round — 168.8 s / 27.1x
      // per-decade; with it the BHJ streams the cached dst-partitioned
      // edges untouched and only node-sized data moves per round —
      // pagerank's matvec discipline). Contract: the reached-node
      // vector must fit a broadcast (≲10^8 nodes, cf.
      // graph_assortativity's loud guard); larger graphs need the
      // shuffle matvec (deg/dist pre-partitioned on the edge layout).
      val relaxed = e.join(broadcast(d), col("src") === col("node"))
        .select(col("dst").as("node"), (col("dist") + 1L).as("dist"))
      // Per-round lineage truncation (the components-loop discipline):
      // d feeds both the keep and the relax side, so without it the
      // plan tree doubles every round — 2^rounds copies of the seed
      // scan and 63 joins at rounds=6, measured at 21 s on the keyed
      // query vs ~1 s truncated. The frame is distance-vector-sized
      // (one row per reached node), so the materialization is cheap.
      // graft.Fixpoint honors spark.graft.reliableCheckpoint — the
      // same durability knob as DedupCluster.components (r11 ADVICE).
      d = graft.Fixpoint.truncate(d.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist")))
    }
    d
  }

  /** Top-`k` most-similar nodes per node by exact integer-ppm Jaccard
    * of their ITEM neighborhoods, over a caller-supplied bipartite
    * membership frame (node, item) — "find sources like this one"
    * over any co-occurrence structure (suppliers sharing parts, docs
    * sharing shingles, domains sharing outlinks).
    *
    * Scale contract (the same three decisions as the oracled
    * `graph_jaccard` key): candidate pairs come ONLY from equi-joining
    * on a shared item (cost Σ_item C(deg,2), linear in edges × cap);
    * items held by more than `hubCap` nodes are EXCLUDED first — the
    * declared semantics, not an approximation of them: degrees and the
    * union term use the same capped edge set, so the reported value is
    * the true Jaccard of the capped neighborhoods; the per-node top-k
    * (ties broken by neighbor id — a total cut) bounds output to
    * k·|nodes|. The membership frame is consumed three times — cache
    * it (the keyed query session-caches; at cluster scale it is a
    * written table).
    *
    * Output: (node, rk, other, common, jacc_ppm), rk in 1..k. */
  def jaccardTopK(membership: DataFrame, nodeCol: String,
      itemCol: String, hubCap: Int, k: Int = 5): DataFrame = {
    require(hubCap >= 1, s"hubCap must be >= 1, got $hubCap")
    require(k >= 1, s"k must be >= 1, got $k")
    val e = membership
      .select(col(itemCol).as("p"), col(nodeCol).as("sup")).distinct()
    val nonHub = e.groupBy(col("p")).agg(count(lit(1)).as("pd"))
      .filter(col("pd") <= hubCap).select(col("p"))
    val ce = e.join(nonHub, "p")
    jaccardTopKOnCapped(ce, k)
  }

  /** jaccardTopK's pair/rank stage over an ALREADY hub-capped and
    * (ideally) cached membership frame with columns (p, sup) — the
    * entry point the keyed query uses so the cap+cache happen once
    * per session. */
  private[graft] def jaccardTopKOnCapped(ce: DataFrame, k: Int)
      : DataFrame = {
    val deg = ce.groupBy(col("sup")).agg(count(lit(1)).as("deg"))
    // Pair generation stays the p-keyed SELF-JOIN — r12 profiled the
    // two candidate rewrites on the 10x staging and both lost:
    // per-item sorted-array collect + mapper-side combination explode
    // measured 4.52 s warm vs the self-join's 3.31 (array/struct
    // churn beats the saved exchange), and caching ce pre-partitioned
    // on p didn't elide the self-join exchanges (InMemoryTableScan
    // fed a fresh Exchange) while slowing the tail. Warm 10x stage
    // split: pairs 3.3 s / rank tail 3.2 s, both linear in the 5.0M
    // pair count — the single-key 10x ratio is 3.66 (r11's 5.96 was
    // full-suite ambient load, not this plan).
    val pairs = ce.as("a").join(ce.as("b"),
        col("a.p") === col("b.p") && col("a.sup") < col("b.sup"))
      .groupBy(col("a.sup").as("s1"), col("b.sup").as("s2"))
      .agg(count(lit(1)).as("common"))
    val sym = pairs.unionByName(
      pairs.select(col("s2").as("s1"), col("s1").as("s2"), col("common")))
    sym
      .join(deg.select(col("sup").as("s1"), col("deg").as("d1")), "s1")
      .join(deg.select(col("sup").as("s2"), col("deg").as("d2")), "s2")
      .select(col("s1"), col("s2"), col("common"),
        expr("common * 1000000 div (d1 + d2 - common)").as("jacc_ppm"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("s1"))
          .orderBy(col("jacc_ppm").desc, col("s2"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("s1").as("node"), col("rk"), col("s2").as("other"),
        col("common"), col("jacc_ppm"))
  }

  /** Synchronous label propagation (Raghavan 2007's LPA, the
    * deterministic synchronous variant): community detection over a
    * SYMMETRIC (doubled) edge frame — the cheap community signal a
    * curation pipeline reads before sampling per-community (domain
    * clusters in a crawl graph, co-supply cliques, topical groups).
    *
    * Semantics (declared, fully deterministic): labels start as the
    * node's own id; each round, EVERY node simultaneously adopts the
    * most frequent label among its neighbors, ties broken by MINIMUM
    * label — a total order, so the result is bit-identical across
    * partitionings and engines (the pagerank determinism argument:
    * exact integer counts + a total tie-break). A FIXED round count is
    * what lets the DuckDB oracle unroll the identical iterations.
    * Synchronous LPA on bipartite structure can oscillate rather than
    * converge — callers pick `rounds` as the label-mixing horizon they
    * want, not a fixpoint guarantee (the label SET still shrinks
    * monotonically: every adopted label was some node's current
    * label).
    *
    * Scale shape (the bfsDistances matvec discipline): the label
    * vector is NODE-sized and explicitly broadcast into the edge join,
    * so the cached dst-partitioned edge relation streams untouched;
    * both per-round aggregates — neighbor-label counts on (dst, lbl)
    * and the argmax on dst — are satisfied by the edges'
    * HashPartitioning(dst) (dst is a prefix of both grouping keys), so
    * a round does ZERO shuffle exchange: O(E) map-side work + a
    * node-sized broadcast, nothing else moves. Same ≲10^8-node
    * broadcast contract as bfsDistances; per-round lineage truncation
    * keeps the plan tree round-count-free. Argmax is
    * max(struct(count, -label)) — one partial-aggregable pass, no
    * window sort.
    *
    * Symmetric-input contract (the kcore rule): every dst must also
    * appear as a src, or dst-only nodes keep stale labels that the
    * label-set-shrinks law no longer covers.
    *
    * Output: (node, lbl) — every node with its community label after
    * `rounds` rounds. */
  def labelPropagation(edges: DataFrame, rounds: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    var lab = graft.Fixpoint.truncate(
      e.select(col("src").as("node")).distinct()
        .withColumn("lbl", col("node")))
    for (_ <- 1 to rounds) {
      val nxt = e.join(broadcast(lab), col("src") === col("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("dst").as("node"), (-col("m.nl")).as("lbl"))
      lab = graft.Fixpoint.truncate(nxt)
    }
    lab
  }

  /** k-core peel: `rounds` synchronous rounds of "drop every node
    * with degree < k, then recount" over a SYMMETRIC (doubled) edge
    * frame — the degeneracy/periphery pruning every graph-quality
    * pipeline runs before the expensive algorithms (a node outside
    * the k-core cannot sit on k edge-disjoint paths; crawl-graph
    * peripheries and one-off contributors peel away first).
    *
    * The op is a SHRINKING fixpoint — the dual of bfsDistances'
    * growing one — run DECREMENTALLY (r13): the full-degree aggregate
    * runs once, then each round broadcasts the just-removed node set,
    * counts edges incident to it in a single stream over the
    * immutable edge relation, and subtracts from the node-sized
    * (node, deg) state — total work O(E + Σ|edges(removed)|) ≤ O(2E)
    * across ALL rounds, the sequential-peel bound; per-round
    * `localCheckpoint` truncates lineage exactly like the components
    * loop (without it the plan tree re-derives round i-1 per round).
    * A FIXED round count is what lets the DuckDB oracle
    * unroll the identical iterations (the pagerank/BFS discipline);
    * callers pick rounds ≥ the cascade depth they care about and the
    * keyed query law-asserts the fixpoint is reached at the fixture.
    * Degrees count the doubled relation's out-edges, so dropping a
    * node removes both directions symmetrically.
    *
    * CONTRACT — symmetric (undirected, doubled) edge input REQUIRED:
    * every dst must also appear as a src. A dst-only node gets no
    * degree row, is never peeled, and its edges never decrement, so
    * an asymmetric (directed) input silently diverges from the
    * pre-r13 recompute loop (which excluded edges to non-src nodes
    * from round-1 degrees). Callers feeding directed edges must
    * double them first (`e.unionByName(e.select(dst, src))`); the
    * keyed-query law suite asserts dst ⊆ src on its fixture
    * (R11dOpsSpec "graph_kcore" symmetry law).
    *
    * Output: (node, deg) — nodes surviving `rounds` peels with their
    * degree INSIDE the surviving subgraph (≥ k at the fixpoint). */
  def kcore(edges: DataFrame, k: Int, rounds: Int,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    kcoreCounted(edges, k, rounds, srcCol, dstCol, counted = false)._1

  /** The measured WORKLOAD denominator for the peel (r18, r17 verdict
    * item 7): E + Σ_t |edges incident to round t's removed set| — the
    * decremental loop's own work bound, counted by running the
    * IDENTICAL loop (kcore is literally this function's first
    * component, so the denominator can never drift from the shipped
    * algorithm). ScaleBench divides wall time by this to state
    * cost-per-peel-edge per decade: the graph WORKLOAD grows
    * super-linearly with data (deeper cascades touch more edges), the
    * per-unit engine cost must stay flat — a number, not a narrative.
    * Instrumentation-only (one extra count action per round); never
    * in a timed or shipped query path. */
  def kcoreWorkUnits(edges: DataFrame, k: Int, rounds: Int,
      srcCol: String = "src", dstCol: String = "dst"): Long =
    kcoreCounted(edges, k, rounds, srcCol, dstCol, counted = true)._2

  /** graph_jaccard's workload denominator (r18): the candidate-pair
    * count Σ_p C(deg_p, 2) the bucketed self-join emits — computed by
    * one aggregate over the capped membership relation, no pair
    * materialization. */
  def jaccardCandidateUnits(membership: DataFrame,
      keyCol: String = "p"): Long = {
    val r = membership.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2")).as("u")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  private def kcoreCounted(edges: DataFrame, k: Int, rounds: Int,
      srcCol: String, dstCol: String, counted: Boolean)
      : (DataFrame, Long) = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // DECREMENTAL peel (r13 rewrite; the r12 verdict's 100x
    // campaign): the r11d loop recomputed the survivor-restricted
    // degree every round — two edge-sized joins + one edge-sized
    // aggregate per round, measured 626 s / 43.5x per-decade at 100x
    // (the 120M-edge relation streamed and shuffled 3x per round).
    // Synchronous peeling is exactly degree DECREMENT: with S_t the
    // survivors after t rounds, deg_t(u) = |N(u) ∩ S_t| =
    // deg_{t-1}(u) − |N(u) ∩ removed_t| (each edge to a removed node
    // subtracts exactly once), so the loop state is the NODE-SIZED
    // (node, deg) table, the full-degree aggregate runs ONCE, and a
    // round only counts edges INCIDENT TO THE JUST-REMOVED set: one
    // broadcast of the shrinking removed frame probed by a single
    // stream over the immutable edge relation (output ∝ touched
    // edges), then a node-sized left join updates the state. Total
    // work across all rounds is O(E + Σ_t |edges(removed_t)|) ≤ O(2E)
    // — the sequential-peel bound — vs O(rounds·E) before. Same
    // ≲10^8-node broadcast contract as bfsDistances; only node-sized
    // frames are checkpointed.
    // graft.Fixpoint honors spark.graft.reliableCheckpoint — the same
    // durability knob as DedupCluster.components (r11 ADVICE).
    val e = graft.Fixpoint.truncate(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    var alive = graft.Fixpoint.truncate(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .select(col("src").as("node"), col("deg")))
    var work = if (counted) e.count() else 0L
    for (_ <- 1 to rounds) {
      val removed = alive.filter(col("deg") < k)
        .select(col("node").as("__r"))
      val dec = e.join(broadcast(removed), col("dst") === col("__r"))
        .groupBy(col("src")).agg(count(lit(1)).as("__c"))
      if (counted)
        work += e.join(broadcast(removed), col("dst") === col("__r"))
          .count()
      alive = graft.Fixpoint.truncate(
        alive.filter(col("deg") >= k)
          .join(dec, col("node") === col("src"), "left")
          .select(col("node"),
            (col("deg") - coalesce(col("__c"), lit(0L))).as("deg")))
    }
    // deg = 0 ⇔ the node has no in-core edge left: the r11d loop's
    // final edges-among-survivors aggregate omitted such nodes (they
    // appear in no surviving edge), so mirror that here. At the
    // fixpoint every survivor has deg ≥ k anyway — this only differs
    // when `rounds` stops short of the cascade depth.
    (alive.filter(col("deg") > 0)
      .select(col("node"), col("deg")), work)
  }
}
