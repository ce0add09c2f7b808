package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Reusable similarity-search building blocks — the public surface
  * behind the oracled `vec_*` keys (SURVEY.md §2.H). Brute-force
  * cosine top-k with a broadcast query side is the exact baseline; the
  * IVF / IVF-PQ scale paths in `operators.LlmQueries` compose the same
  * arithmetic (codegen `fdot`/`fnorm2` sequential folds, so results
  * are bit-stable regardless of partitioning).
  */
object VectorSearch {

  /** Exact cosine top-k: for every query row, the k nearest corpus
    * rows by cosine similarity (ties broken by ascending corpus id —
    * total order, engine-independent). The query side must be bounded
    * (it is broadcast); the corpus streams — at 100 TB this is one
    * scan, no shuffle of the corpus. Self-matches (equal ids) are
    * excluded. Output: (q_id, rank, c_id, cos). */
  def knnCosine(queries: DataFrame, corpus: DataFrame, k: Int,
      qIdCol: String = "q_id", qVecCol: String = "qe",
      cIdCol: String = "c_id", cVecCol: String = "ce"): DataFrame = {
    graft.functions.VectorExpressions.register(queries.sparkSession)
    val q = queries.select(col(qIdCol).as("q_id"), col(qVecCol).as("qe"))
      .withColumn("qss", expr("fnorm2(qe)"))
    val c = corpus.select(col(cIdCol).as("c_id"), col(cVecCol).as("ce"))
      .withColumn("css", expr("fnorm2(ce)"))
    broadcast(q).crossJoin(c).filter(col("q_id") =!= col("c_id"))
      .withColumn("dot", expr("fdot(qe, ce)"))
      .withColumn("cos", col("dot") / sqrt(col("qss") * col("css")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("c_id"))).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"), col("cos"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540) over ANY embedding frame: vectors meet only
    * inside their (cluster cell × sign bucket) block, an exact cosine
    * gate keeps real semantic duplicates, and min-label connected
    * components resolve the pair relation into dedup groups. Output is
    * one row per input vector — (idCol, comp, keep) with `comp` the
    * component's minimum id (itself for singletons) and `keep` true
    * exactly for the canonical survivor, the relation a pipeline joins
    * back onto its corpus to drop semantic duplicates.
    *
    * `cellCol` is the caller's cluster assignment (the paper's k-means
    * cell; any long-castable column). Omitting it degrades blocking to
    * sign buckets alone — fine for small frames, but at scale the cell
    * is what bounds per-block enumeration. `signBits` trades recall
    * for cost exactly like every LSH knob here: antipodal-ish near-dups
    * inside one cell can straddle a bucket boundary. Ids must be
    * numeric (the component fixpoint's convergence probe sums labels —
    * DedupCluster.components' contract). */
  def semanticDedup(vectors: DataFrame, idCol: String, vecCol: String,
      cellCol: Option[String] = None, minCos: Double = 0.95,
      signBits: Int = 8): DataFrame = {
    require(signBits >= 0 && signBits <= 62,
      s"signBits must be in [0, 62], got $signBits")
    graft.functions.VectorExpressions.register(vectors.sparkSession)
    val base = cellCol match {
      case Some(c) => vectors.select(col(idCol).as("vid"),
        col(vecCol).as("ve"), col(c).cast(LongType).as("cell"))
      case None => vectors.select(col(idCol).as("vid"),
        col(vecCol).as("ve"), lit(0L).as("cell"))
    }
    val blocked = base
      .withColumn("ss", expr("fnorm2(ve)"))
      .withColumn("bucket",
        if (signBits == 0) lit(0L)
        else (0 until signBits).map(i =>
          when(element_at(col("ve"), i + 1) >= 0f, lit(1L << i))
            .otherwise(lit(0L))).reduce(_ + _))
    val a = blocked.select(col("cell"), col("bucket"),
      col("vid").as("da"), col("ve").as("ea"), col("ss").as("ssa"))
    val b = blocked.select(col("cell"), col("bucket"),
      col("vid").as("db"), col("ve").as("eb"), col("ss").as("ssb"))
    val pairs = a.join(b, Seq("cell", "bucket"))
      .filter(col("da") < col("db"))
      .withColumn("cos",
        expr("fdot(ea, eb)") / sqrt(col("ssa") * col("ssb")))
      .filter(col("cos") >= minCos)
      .select(col("da"), col("db"))
    base.select(col("vid"))
      .join(graft.operators.DedupCluster.components(pairs)
              .select(col("doc_id").as("vid"), col("comp")),
            Seq("vid"), "left")
      .withColumn("comp", coalesce(col("comp"), col("vid")))
      .withColumn("keep", col("vid") === col("comp"))
      .select(col("vid").as(idCol), col("comp"), col("keep"))
  }

  /** MMR diversified re-rank (Carbonell & Goldstein SIGIR'98) over a
    * per-query shortlist: greedily pick `picks` candidates, each
    * maximizing lambda·rel − (1−lambda)·max-sim-to-already-picked
    * (ties on c_id — a total cut). `shortlist` = (q_id, c_id, rel);
    * `sims` = (q_id, a, b, sim), both directions, over shortlist
    * members. Cost is bounded by the shortlist size per query
    * regardless of corpus size — stage 1 (knnCosine / IVF / IVF-PQ)
    * stays the expensive part. The greedy rounds are unrolled at the
    * FIXED pick count so a SQL oracle can replay them; lambdaPct is
    * an integer percent so both engines build identical double
    * constants. Output: (q_id, pick, c_id, score).
    *
    * CONTRACT (r12 ADVICE, was only a code comment): `sims` must FULLY
    * cover the shortlist — one row with a NON-NULL `sim` for every
    * ordered (candidate, selected) pair within a query. A missing pair
    * OR a NULL `sim` value raises; "absent pair = dropped candidate"
    * sparse inputs are rejected, not silently honored. */
  def mmrRerank(shortlist: DataFrame, sims: DataFrame, picks: Int,
      lambdaPct: Int = 70): DataFrame = {
    require(picks >= 1, s"picks must be >= 1, got $picks")
    require(lambdaPct >= 0 && lambdaPct <= 100,
      s"lambdaPct must be in [0, 100], got $lambdaPct")
    val lam = lambdaPct / 100.0
    val om = (100 - lambdaPct) / 100.0
    val w = Window.partitionBy(col("q_id"))
    var selected = shortlist
      .withColumn("rn", row_number().over(
        w.orderBy(col("rel").desc, col("c_id"))))
      .filter(col("rn") === 1)
      .select(col("q_id"), lit(1L).as("pick"), col("c_id"),
        (col("rel") * lam).as("score"))
    for (r <- 2 to picks) {
      val selIds = selected.select(col("q_id").as("sq"),
        col("c_id").as("s_id"))
      val maxsim = sims.join(selIds,
          col("q_id") === col("sq") && col("b") === col("s_id"))
        .groupBy(col("q_id"), col("a")).agg(max(col("sim")).as("ms"))
      // LEFT join + loud guard (r11 ADVICE): an inner join would
      // silently drop any shortlist candidate whose sims rows are
      // missing — an incomplete sims input must fail, not quietly
      // pick the wrong candidates. sims must cover every ordered
      // (candidate, selected) pair within a query.
      val next = shortlist
        .join(selIds, col("q_id") === col("sq") &&
          col("c_id") === col("s_id"), "left_anti")
        .join(maxsim.select(col("q_id").as("mq"), col("a"), col("ms")),
          col("q_id") === col("mq") && col("c_id") === col("a"), "left")
        .withColumn("ms", when(col("ms").isNull, raise_error(concat(
            lit("mmrRerank: sims has no covering row (or only NULL " +
              "sim values) for shortlist pair q_id="),
            col("q_id").cast("string"), lit(" c_id="),
            col("c_id").cast("string"),
            lit(" — sims must cover all shortlist ordered pairs " +
              "with non-NULL sim"))))
          .otherwise(col("ms")))
        .withColumn("score", col("rel") * lam - col("ms") * om)
        .withColumn("rn", row_number().over(
          w.orderBy(col("score").desc, col("c_id"))))
        .filter(col("rn") === 1)
        .select(col("q_id"), lit(r.toLong).as("pick"), col("c_id"),
          col("score"))
      selected = selected.unionByName(next)
    }
    selected
  }
}
