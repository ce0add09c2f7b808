package graft.operators

import graft.{Det, QueryPack, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2.H — LLM-data-pipeline operators (SURVEY.md §2.H).
  *
  * Cross-engine determinism strategy (§7.4):
  * - No libm transcendentals in any oracled output. TF-IDF uses the
  *   log-free rational envelope idf=(N+1)/(df+1) scaled to an exact
  *   integer score: every intermediate (tf·1e6·(N+1)) is an integer
  *   < 2^53, exactly representable in double; the single division is
  *   IEEE-correctly-rounded identically in both engines; floor of an
  *   identical double is identical.
  * - Vector folds (sum of squares, dot products, distances) run
  *   **sequentially over the array in element order** in BOTH engines
  *   (Spark `aggregate` HOF ↔ DuckDB `list_reduce`), with float→double
  *   cast before any arithmetic — bit-identical doubles, so even
  *   ORDER BY on a raw cosine agrees.
  * - Group-level float reductions (mean norm) go through round(x,6)
  *   first: both engines round the same binary double away-from-zero,
  *   and DECIMAL(18,6) summation is order-independent.
  *
  * Scale design (100 TB):
  * - `text_*`: explode → two-phase hash agg; vocabulary table joins are
  *   broadcast. No windows over low-cardinality partitions.
  * - `dedup_near`: candidate generation is a single shuffle on a
  *   64-bit token-set fingerprint (perfect blocking — docs only meet
  *   if their token SETS are identical), then in-group pair join
  *   bounded by group size. The fixture vocabulary is 31 terms with
  *   min doc-frequency 25/500, so SURVEY §2.H's rare-token blocking
  *   has zero candidates BY CONSTRUCTION on this data; the fingerprint
  *   block is the correct fixture-shaped stage, and the general
  *   τ<1 MinHash-LSH path ships as `dedup_minhash` (TrainQueries).
  * - `vec_knn`: query side bounded to 10 vectors and broadcast; one
  *   scan of the candidate side, top-k per query via window. The
  *   unbounded-scale path is IVF/LSH pruning (see `dedup_embed`).
  * - `vec_centroid`: per-dimension integer-quantized sums (exact,
  *   order-free, mergeable) — the same two-phase shape a 1000-executor
  *   cluster needs; never collects vectors to the driver.
  */
object LlmQueries extends QueryPack {

  /** vec_rerank_mmr knobs — shared by the Spark loop and the unrolled
    * oracle template (the pagerank constants discipline): shortlist
    * size per query and the FIXED greedy pick count. */
  val mmrShort = 20
  val mmrPicks = 3

  /** vec_lsh knobs — L hash tables × b signed projections per table,
    * shared by the Spark key and the DuckDB oracle. */
  val lshTables = 4
  val lshBits = 6
  val lshDims = 64

  /** The (t, j) hyperplane's ±1 entry at dimension d: parity of the
    * first hex digit of md5("t_j_d"). md5 is engine-independent and
    * properly mixing — a multiplicative-congruential parity is LINEAR
    * in the flattened plane index, so two planes came out
    * bit-identical (measured max |plane dot| = 64/64; md5 gives
    * 28/64, the random-sign regime). The DuckDB oracle evaluates the
    * same md5 text; this Scala twin feeds the plane in as a literal
    * array so the Spark side stays one map-side codegen fold. */
  private[graft] def lshSign(t: Int, j: Int, d: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${t}_${j}_$d".getBytes("UTF-8"))
    if (((md(0) >> 4) & 1) == 0) 1.0f else -1.0f
  }

  /** The (vec_id, t, bkt) bucket relation over any `(vec_id,
    * embedding)` frame — the LSH index's member relation, shared by
    * vec_lsh's inline candidate join and st28's streaming
    * transformWithState maintenance (StreamQueries.lshBucketsTws) so
    * the streaming index cannot drift from the oracled batch one.
    * Caller must have registered VectorExpressions (`fdot`). */
  private[graft] def lshBuckets(e: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val bktCols = (0 until lshTables).map(lshBucketCol)
    e.select(col("vec_id"), posexplode(array(bktCols: _*)).as(Seq("t", "bkt")))
  }

  private[graft] def lshPlane(t: Int, j: Int): Array[Float] =
    Array.tabulate(lshDims)(d => lshSign(t, j, d))

  /** Table t's bucket id over an `embedding` column: the b-bit fold
    * of signed projections (codegen `fdot` per plane). Shared by
    * vec_lsh (inline buckets), vec_lsh_table (the written index) and
    * st28's streaming bucket maintenance so the layouts cannot
    * drift. */
  private[graft] def lshBucketCol(t: Int): org.apache.spark.sql.Column =
    (0 until lshBits).map { j =>
      val pl = typedLit(lshPlane(t, j))
      when(call_function("fdot", col("embedding"), pl) >= lit(0.0),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The LSH bucket index as a WRITTEN table partitioned by
    * (t, bkt) — the vec_knn_ivf_table discipline applied to the
    * training-free index: each of the L×2^b buckets is a directory
    * holding its member vectors (id, embedding, norm), so a probe
    * join dynamic-partition-prunes to EXACTLY the query batch's
    * bucket union and reads nothing else. At 100 TB the bucket
    * index IS the corpus and a 40-of-256-bucket probe must read
    * 40/256 of it — directory pruning is that IO deletion. Written
    * once per session (the offline index build); consumers read the
    * metastore table. Single-writer per data dir (r17 ADVICE): the
    * DROP + overwrite of `lsh_idx_<dirTag>` and its fixed path
    * assumes one JVM builds indexes for a given dir at a time — the
    * shared assumption of ALL written-index keys, documented at
    * graft.Util.dirTag. */
  private def lshIndexTable(s: org.apache.spark.sql.SparkSession,
                            dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val tag = graft.Util.dirTag(dir)
    graft.SessionCache.cached(s, s"lsh.table:$dir", persist = false) {
      graft.functions.VectorExpressions.register(s)
      s.sql(s"DROP TABLE IF EXISTS lsh_idx_$tag")
      val bktCols = (0 until lshTables).map(lshBucketCol)
      Tables.load(s, dir, "embeddings")
        .select($"vec_id".as("c_id"), $"embedding",
          expr("fnorm2(embedding)").as("css"))
        .select($"c_id", $"embedding".as("ce"), $"css",
          posexplode(array(bktCols: _*)).as(Seq("t", "bkt")))
        .write.mode("overwrite")
        .option("path", s"target/roundtrip/${tag}_lsh_idx")
        .partitionBy("t", "bkt")
        .saveAsTable(s"lsh_idx_$tag")
      s.range(1).toDF() // memo token: the artifact is the table
    }
    s.table(s"lsh_idx_$tag")
  }

  /** Distinct (doc_id, term) pairs, lowercased whitespace tokens. */
  private def tokens(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      .filter($"term" =!= "")
      .distinct()
  }

  /** (label, pos, cq): per-label per-dimension centroid from
    * integer-quantized (1e-7) sums — exact, order-free, mergeable.
    * Shared by vec_centroid (output) and vec_knn_ivf (codebook). */
  private def quantCentroids(e: org.apache.spark.sql.DataFrame) = {
    import e.sparkSession.implicits._
    // The /1e7 rescale matters (r16, caught by R16OpsSpec's runtime
    // partition metric): without it the centroid magnitudes (~1e6 per
    // dim) dwarf the embeddings, the query-independent Σc² term
    // dominates every distance, and ONE centroid is nearest for ALL
    // vectors — the IVF inverted lists degenerate to a single
    // populated cell and every "probe" scans the whole corpus. Its
    // sibling pqCodebook always rescaled; this one must too. The
    // arithmetic stays exact cross-engine: sum-of-floors is an
    // integer-valued double, and both divisions are IEEE
    // correctly-rounded with the same association in the oracle.
    e.select($"label", posexplode($"embedding").as(Seq("pos", "x")))
      .withColumn("xq", floor($"x".cast(DoubleType) * 1e7))
      .groupBy($"label", $"pos")
      .agg(((sum($"xq").cast(DoubleType) / count(lit(1))) / lit(1e7))
        .as("cq"))
  }

  /** (cl, carr): each centroid re-assembled as an array ordered by
    * dimension. */
  private def centroidArrays(cent: org.apache.spark.sql.DataFrame) = {
    import cent.sparkSession.implicits._
    cent.groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"pos", $"cq"))),
        t => t.getField("cq")).as("carr"))
      .select($"label".as("cl"), $"carr")
  }

  /** Sequential-fold squared distance from `embedding` to `carr`. */
  private def sqdistToCentroid: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{aggregate, col, lit, zip_with}
    aggregate(
      zip_with(col("embedding"), col("carr"),
        (x, cc) => (x.cast(DoubleType) - cc) * (x.cast(DoubleType) - cc)),
      lit(0.0), (acc, x) => acc + x)
  }

  /** PQ codebook (clabel, q, carr): m=4 × 16-dim per-label
    * quantized-mean subspace centroids (Jégou et al., TPAMI'11 layout)
    * — the PQ family's model artifact, built once per session
    * (shared: vec_pq, vec_ivfpq). 40 rows; always broadcast. */
  private def pqCodebook(s: org.apache.spark.sql.SparkSession,
                         dir: String): org.apache.spark.sql.DataFrame =
    graft.SessionCache.cached(s, s"pq.codebook:$dir") {
      import s.implicits._
      val sub = 16
      Tables.load(s, dir, "embeddings")
        .select($"label", posexplode($"embedding").as(Seq("pos", "x")))
        .withColumn("q", expr(s"CAST(pos div $sub AS INT)"))
        .withColumn("xq", floor($"x".cast(DoubleType) * 1e7))
        .groupBy($"label".as("clabel"), $"q", $"pos")
        .agg(((sum($"xq").cast(DoubleType) / count(lit(1))) / lit(1e7))
          .as("cq"))
        .groupBy($"clabel", $"q")
        .agg(transform(array_sort(collect_list(struct($"pos", $"cq"))),
          t => t.getField("cq")).as("carr"))
    }

  /** PQ code assignment (vec_id, q, clabel, d): each vector's nearest
    * subspace centroid + squared reconstruction error — the compressed
    * index payload (4 one-byte codes per vector, 16× vs float32).
    * Session-cached: this IS the index-build step; vec_pq emits it,
    * vec_ivfpq's ADC search probes it. */
  private def pqCodes(s: org.apache.spark.sql.SparkSession,
                      dir: String): org.apache.spark.sql.DataFrame =
    graft.SessionCache.cached(s, s"pq.codes:$dir") {
      import s.implicits._
      subvectors(s, dir, 4).join(broadcast(pqCodebook(s, dir)), Seq("q"))
        .withColumn("d", aggregate(
          zip_with($"v", $"carr",
            (x, c) => (x.cast(DoubleType) - c) * (x.cast(DoubleType) - c)),
          lit(0.0), (a, b) => a + b))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"vec_id", $"q").orderBy($"d", $"clabel")))
        .filter($"rn" === 1)
        .select($"vec_id", $"q", $"clabel", $"d")
    }

  /** Subvector relation (vec_id, q, v) for an m-way split of the
    * 64-dim embeddings — map-side slices, no explode/regroup shuffle. */
  private def subvectors(s: org.apache.spark.sql.SparkSession,
                         dir: String, m: Int): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val sub = 64 / m
    Tables.load(s, dir, "embeddings")
      .select($"vec_id", explode(array((0 until m).map(j =>
        struct(lit(j).as("q"),
          slice($"embedding", j * sub + 1, sub).as("v"))): _*)).as("s"))
      .select($"vec_id", $"s.q".as("q"), $"s.v".as("v"))
  }

  /** 256-entry orthant-seeded PQ codebook (clabel, q, carr) for the
    * m=8 × 8-dim layout vec_ivfpq searches with: each subspace's code
    * cells are its 2^8 sign-pattern orthants, the codebook entry is
    * the quantized mean of the cell's members. Deterministic (no
    * k-means iteration) yet data-adaptive — measured on the fixture it
    * lifts full-corpus ADC recall@5 from 0.08 (per-label codebook) to
    * 0.48. Session-cached model artifact. */
  private def pq8Codebook(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame =
    graft.SessionCache.cached(s, s"pq8.codebook:$dir") {
      import s.implicits._
      subvectors(s, dir, 8)
        .withColumn("b", aggregate(
          transform($"v", x => when(x > 0f, 1).otherwise(0)),
          lit(0), (a, x) => a * 2 + x))
        .select($"b", $"q", posexplode($"v").as(Seq("pos", "x")))
        .withColumn("xq", floor($"x".cast(DoubleType) * 1e7))
        .groupBy($"b".as("clabel"), $"q", $"pos")
        .agg(((sum($"xq").cast(DoubleType) / count(lit(1))) / lit(1e7))
          .as("cq"))
        .groupBy($"clabel", $"q")
        .agg(transform(array_sort(collect_list(struct($"pos", $"cq"))),
          t => t.getField("cq")).as("carr"))
    }

  /** PQ code assignment (vec_id, q, clabel): each subvector's OWN
    * orthant — O(N·d) encode, no codebook scan (a 256-way argmin
    * encode costs k× more and only bought recall 0.98 vs 0.92 here,
    * measured r7). The 8-byte-per-vector compressed index vec_ivfpq's
    * ADC stage scans; session-cached build-once artifact. */
  private def pq8Codes(s: org.apache.spark.sql.SparkSession,
                       dir: String): org.apache.spark.sql.DataFrame =
    graft.SessionCache.cached(s, s"pq8.codes:$dir") {
      import s.implicits._
      subvectors(s, dir, 8)
        .withColumn("clabel", aggregate(
          transform($"v", x => when(x > 0f, 1).otherwise(0)),
          lit(0), (a, x) => a * 2 + x))
        .select($"vec_id", $"q", $"clabel")
    }

  /** IVF inverted-list assignment (cell, c_id, ce, css): every vector's
    * nearest coarse centroid. Session-cached index build — shared by
    * vec_knn_ivf (float re-rank probe) and vec_ivfpq (ADC probe). */
  private def ivfCells(s: org.apache.spark.sql.SparkSession,
                       dir: String): org.apache.spark.sql.DataFrame =
    graft.SessionCache.cached(s, s"ivf.cells:$dir") {
      import s.implicits._
      graft.functions.VectorExpressions.register(s)
      val e = Tables.load(s, dir, "embeddings")
        .withColumn("ss", expr("fnorm2(embedding)"))
      val centArr = graft.SessionCache.cached(s, s"ivf.codebook:$dir") {
        centroidArrays(quantCentroids(e))
      }
      e.crossJoin(broadcast(centArr))
        .withColumn("d", sqdistToCentroid)
        .withColumn("rn", row_number().over(
          Window.partitionBy($"vec_id").orderBy($"d", $"cl")))
        .filter($"rn" === 1)
        .select($"cl".as("cell"), $"vec_id".as("c_id"),
                $"embedding".as("ce"), $"ss".as("css"))
    }

  /** The IVF inverted lists as a WRITTEN, cell-PARTITIONED table
    * (r15, verdict item 3 — the graph_jaccard_bucketed discipline
    * applied to the vector index): one directory per coarse cell, so
    * a probe join reads ONLY the probed cells' files via dynamic
    * partition pruning. PARTITIONING (not bucketing) is the right
    * physical layout for an inverted list: bucketing deletes
    * exchanges, but an IVF probe's whole point is deleting IO — at
    * 100 TB the index is the corpus and a 3-of-256-cell probe must
    * list/scan 3/256 of it, which is exactly what directory pruning
    * buys (scan_dpp's proven mechanics). Written once per session
    * (the write is the index build a real pipeline runs offline);
    * consumers read the metastore table. */
  private def ivfCellsTable(s: org.apache.spark.sql.SparkSession,
                            dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val tag = graft.Util.dirTag(dir)
    graft.SessionCache.cached(s, s"ivf.cellstable:$dir",
        persist = false) {
      s.sql(s"DROP TABLE IF EXISTS ivf_cells_$tag")
      ivfCells(s, dir)
        .write.mode("overwrite")
        .option("path", s"target/roundtrip/${tag}_ivf_cells")
        .partitionBy("cell")
        .saveAsTable(s"ivf_cells_$tag")
      s.range(1).toDF() // memo token: the artifact is the table
    }
    s.table(s"ivf_cells_$tag")
  }

  /** vec_ivfpq's query body, parameterized by the two index
    * relations (session-cached DataFrames or written tables — the
    * layout variants share one implementation): `cand` = (cell, c_id)
    * inverted lists, `codes` = (c_id, q, clabel) PQ codes. See the
    * vec_ivfpq key for the full ADC + exact-re-rank semantics. */
  private def ivfpqQuery(s: org.apache.spark.sql.SparkSession,
      dir: String, cand: org.apache.spark.sql.DataFrame,
      codes: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    graft.functions.VectorExpressions.register(s)
    val m = 8; val sub = 8
    val e = Tables.load(s, dir, "embeddings")
      .withColumn("ss", expr("fnorm2(embedding)"))
    val centArr = graft.SessionCache.cached(s, s"ivf.codebook:$dir") {
      centroidArrays(quantCentroids(e))
    }
    // Each query probes its 3 nearest coarse cells (vec_knn_ivf rule).
    val probe = e.filter($"vec_id" < 10).crossJoin(broadcast(centArr))
      .withColumn("d", sqdistToCentroid)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"d", $"cl")))
      .filter($"rn" <= 3)
      .select($"vec_id".as("q_id"), $"cl".as("cell"))
    // ADC lookup table: 10 queries × 8 subspaces × 256 codes.
    val qsub = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"),
        explode(array((0 until m).map(j =>
          struct(lit(j).as("q"),
            slice($"embedding", j * sub + 1, sub).as("v"))): _*)).as("s"))
      .select($"q_id", $"s.q".as("q"), $"s.v".as("v"))
    val adc = qsub.join(broadcast(pq8Codebook(s, dir)), Seq("q"))
      .withColumn("dq", aggregate(
        zip_with($"v", $"carr",
          (x, c) => (x.cast(DoubleType) - c) * (x.cast(DoubleType) - c)),
        lit(0.0), (a, b) => a + b))
      .select($"q_id", $"q", $"clabel", $"dq")
    def dcol(j: Int) = max(when($"q" === j, $"dq")).as(s"d$j")
    val shortlist = probe.join(cand, "cell").filter($"q_id" =!= $"c_id")
      .select($"q_id", $"c_id")
      .join(codes, "c_id")
      .join(broadcast(adc), Seq("q_id", "q", "clabel"))
      .groupBy($"q_id", $"c_id")
      .agg(dcol(0), dcol(1), dcol(2), dcol(3),
           dcol(4), dcol(5), dcol(6), dcol(7))
      .withColumn("adist",
        $"d0" + $"d1" + $"d2" + $"d3" + $"d4" + $"d5" + $"d6" + $"d7")
      .withColumn("srk", row_number().over(
        Window.partitionBy($"q_id").orderBy($"adist", $"c_id")))
      .filter($"srk" <= 50)
      .select($"q_id", $"c_id")
    // Exact re-rank of the 50-candidate shortlist only.
    shortlist
      .join(e.select($"vec_id".as("q_id"), $"embedding".as("qe")), "q_id")
      .join(e.select($"vec_id".as("c_id"), $"embedding".as("ce")), "c_id")
      .withColumn("l2", aggregate(
        zip_with($"qe", $"ce",
          (x, y) => (x.cast(DoubleType) - y.cast(DoubleType)) *
                    (x.cast(DoubleType) - y.cast(DoubleType))),
        lit(0.0), (a, b) => a + b))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"l2", $"c_id"))
        .cast(LongType))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"c_id", round($"l2", 6).as("l2_r"))
      .orderBy($"q_id", $"rank")
  }

  /** vec_knn_ivf's query body, parameterized by the inverted-list
    * relation (session-cached DataFrame or written partitioned table
    * — the two layout variants share one implementation, so their
    * equality law is structural). Codebook: the shared quantized
    * centroids (same construction vec_centroid emits, enforced by
    * using one helper). Session-cached: the codebook is a model
    * artifact built once and probed from TWO branches (candidate
    * assignment + query probe) — without the cache each branch (and
    * every re-run) replans and recomputes the full-corpus centroid
    * aggregate. A few hundred rows, so the cache cost is nil;
    * SessionCache releases the entry at session end. */
  private def knnIvfQuery(s: org.apache.spark.sql.SparkSession,
      dir: String, cand: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    graft.functions.VectorExpressions.register(s)
    val e = Tables.load(s, dir, "embeddings")
      .withColumn("ss", expr("fnorm2(embedding)"))
    val centArr = graft.SessionCache.cached(s, s"ivf.codebook:$dir") {
      centroidArrays(quantCentroids(e))
    }
    // Each query probes its 3 nearest cells. Session-cached (r16):
    // the 30-row probe assignment is ALSO the dim side of the
    // cell-partitioned table's dynamic partition pruning — as a
    // persisted tiny relation its stats are honest, so the planner's
    // benefit estimate lets the DPP subquery run standalone and the
    // index scan skips every unprobed cell (the R16OpsSpec runtime
    // metric; behind the raw crossJoin+window subplan the estimator
    // saw an expensive dim side and degraded the partition filter to
    // TRUE — full scan).
    val probe = graft.SessionCache.cached(s, s"ivf.probe:$dir") {
      e.filter($"vec_id" < 10).crossJoin(broadcast(centArr))
        .withColumn("d", sqdistToCentroid)
        .withColumn("rn", row_number().over(
          Window.partitionBy($"vec_id").orderBy($"d", $"cl")))
        .filter($"rn" <= 3)
        .select($"vec_id".as("q_id"), $"embedding".as("qe"),
                $"ss".as("qss"), $"cl".as("cell"))
    }
    // The query-batch bound, restated ON TOP of the cached relation:
    // semantically a no-op (the cache already holds only vec_id < 10),
    // but PartitionPruning only inserts a DPP subquery when the dim
    // side carries a likely-selective predicate — the cache boundary
    // would otherwise hide it and the partitioned index scan would
    // silently read every cell.
    val probeQ = probe.filter($"q_id" < 10)
    broadcast(probeQ).join(cand, "cell").filter($"q_id" =!= $"c_id")
      .withColumn("cos", expr("fdot(qe, ce)") / sqrt($"qss" * $"css"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cos".desc, $"c_id"))
        .cast(LongType))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank", $"c_id", round($"cos", 6).as("cos_r"))
      .orderBy($"q_id", $"rank")
  }

  /** The PQ code index as a WRITTEN table bucketed+sorted by the id
    * it is probed on (r15, verdict item 3): vec_ivfpq's shortlist
    * stage joins the CORPUS-SIZED code relation to the probed
    * candidate ids on c_id — with the codes bucketed by c_id the SMJ
    * consumes the bucket layout directly, so the corpus-sized side
    * never exchanges OR sorts (only the small candidate side
    * shuffles into the bucket partitioning). repartition(buckets)
    * before write = one file per bucket, which is what lets Spark
    * credit the persisted sortBy order. */
  private def pq8CodesTable(s: org.apache.spark.sql.SparkSession,
                            dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val buckets = s.conf.getOption("spark.graft.pq.buckets")
      .map(_.toInt).getOrElse(32)
    val tag = graft.Util.dirTag(dir) +
      (if (buckets == 32) "" else s"_b$buckets")
    graft.SessionCache.cached(s, s"pq8.codestable:$dir:$buckets",
        persist = false) {
      s.sql(s"DROP TABLE IF EXISTS pq8_codes_$tag")
      pq8Codes(s, dir)
        .select($"vec_id".as("c_id"), $"q", $"clabel")
        .repartition(buckets, $"c_id")
        .write.mode("overwrite")
        .option("path", s"target/roundtrip/${tag}_pq8_codes")
        .bucketBy(buckets, "c_id").sortBy("c_id")
        .saveAsTable(s"pq8_codes_$tag")
      s.range(1).toDF() // memo token: the artifact is the table
    }
    s.table(s"pq8_codes_$tag")
  }

  /** Resolved semantic dedup relation — the public parameterized
    * api.VectorSearch.semanticDedup (SemDeDup shape: vectors meet
    * only inside their (IVF cell × 8-bit sign bucket) block, exact
    * cosine gate, min-label components) applied to the session-cached
    * cell index. The cell bounds candidates to one cluster and the
    * sign-bucket sub-block keeps per-block enumeration linear even
    * when one semantic cluster holds a million vectors at 100 TB.
    * Memoized once per session per dir (the fixpoint is
    * driver-iterated — every iterative index artifact since r7). */
  private def semanticDedupRel(s: org.apache.spark.sql.SparkSession,
                               dir: String): org.apache.spark.sql.DataFrame =
    graft.SessionCache.cached(s, s"dedup.semres:$dir", persist = false) {
      graft.api.VectorSearch.semanticDedup(
        ivfCells(s, dir), idCol = "c_id", vecCol = "ce",
        cellCol = Some("cell"), minCos = 0.3)
    }

  def queries: Seq[(String, Q)] = Seq(
    // Top-50 terms over the English subset; total ORDER BY (cnt desc,
    // term) so the k-boundary is deterministic. TakeOrderedAndProject.
    "text_wordcount" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .filter($"lang" === "en")
        .select(explode(split(lower($"text"), " ")).as("term"))
        .filter($"term" =!= "")
        .groupBy($"term").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"term")
        .limit(50)
    }),

    // Corpus n-gram frequency table (r11c): top-100 bigrams by total
    // occurrences with document frequency — the LM-training corpus
    // statistic (n-gram count tables ARE a KenLM/CCNet artifact) and
    // the canonical map-side-combine job: bigrams are generated
    // entirely map-side (`transform` over the token array — no
    // window, no lead, no shuffle before the partial aggregate), the
    // only exchange is the bigram-keyed final aggregate, and the
    // top-k cut is TakeOrderedAndProject with a total (n_occ DESC,
    // bigram) order; the rank window then runs over the 100
    // survivors only (sample_reservoir's shape).
    "text_ngrams" -> ((s, dir) => {
      import s.implicits._
      val top = Tables.load(s, dir, "documents")
        .select($"doc_id", split(lower($"text"), " ").as("t"))
        // size-1 < 1 would make sequence() DESCEND (text_dupspans'
        // pitfall) — single-token docs emit no bigrams in BOTH
        // engines via this filter.
        .filter(size($"t") >= 2)
        .select($"doc_id", explode(expr(
          "transform(sequence(1, size(t) - 1)," +
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
          .as("bigram"))
        .groupBy($"bigram")
        .agg(count(lit(1)).as("n_occ"),
          countDistinct($"doc_id").as("n_docs"))
        .orderBy($"n_occ".desc, $"bigram")
        .limit(100)
      top.withColumn("rk", row_number().over(
          Window.orderBy($"n_occ".desc, $"bigram")).cast(LongType))
        .select($"rk", $"bigram", $"n_occ", $"n_docs")
        .orderBy($"rk")
    }),

    // Corpus stats per (lang, source): counts are exact integers; the
    // two averages are single divisions of exact integer sums.
    "text_stats" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .withColumn("n_tok", size(split($"text", " ")).cast(LongType))
        .groupBy($"lang", $"source")
        .agg(count(lit(1)).as("n_docs"),
             sum($"n_chars").as("sum_chars"),
             (sum($"n_chars").cast(DoubleType) / count(lit(1)))
               .as("avg_chars"),
             sum($"n_tok").as("sum_tok"),
             (sum($"n_tok").cast(DoubleType) / count(lit(1)))
               .as("avg_tok"),
             max($"n_tok").as("max_tok"))
        .orderBy($"lang", $"source")
    }),

    // TF-IDF with the log-free rational idf envelope (header note):
    // score = floor(tf * 1e6 * (N+1) / (df+1)); top term per doc.
    // df and N are tiny → broadcast joins, no extra shuffle.
    "text_tfidf" -> ((s, dir) => {
      import s.implicits._
      val en = Tables.load(s, dir, "documents").filter($"lang" === "en")
      val tok = en
        .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
        .filter($"term" =!= "")
      val tf = tok.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      val dfreq = tok.distinct().groupBy($"term")
        .agg(count(lit(1)).as("df"))
      val n = en.agg(count(lit(1)).as("n_docs"))
      val scored = tf
        .join(broadcast(dfreq), "term")
        .crossJoin(broadcast(n))
        .withColumn("score",
          floor((($"tf" * lit(1000000.0)) * ($"n_docs" + 1)) / ($"df" + 1)))
      scored
        .withColumn("rn", row_number().over(
          Window.partitionBy($"doc_id").orderBy($"score".desc, $"term")))
        .filter($"rn" === 1)
        .select($"doc_id", $"term".as("top_term"), $"tf", $"df", $"score")
        .orderBy($"doc_id")
    }),

    // BM25 retrieval scoring (r7) — top-10 English docs for a fixed
    // 4-term query, with the header's determinism strategy applied to
    // the full Okapi form (k1=1.2, b=0.75):
    // - the tf-saturation factor tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))
    //   is cleared of fractions by 20·S (S=Σdl, avgdl=S/N):
    //   44·tf·S / (20·tf·S + 6·S + 18·dl·N) — all-integer num/den;
    // - idf uses the log-free rational surrogate (2N−2df+1)/(2df+1)
    //   (the odds inside Robertson idf; per-term rank-equivalent to
    //   ln-idf, NOT globally rank-equivalent to ln-BM25 — this is
    //   graft's documented scoring variant, chosen so both engines
    //   divide bit-identical BIGINTs; products stay < 2^53 up to
    //   ~10^9-token corpora, past which the factors need rebalancing);
    // - the 4 per-term contributions come back as PIVOTED columns and
    //   sum in fixed left-to-right association — never via an
    //   order-nondeterministic double SUM().
    // Scale: tf is filtered to the query terms BEFORE its aggregate
    // (the shuffle carries ≤|Q| rows per doc); df/N/S are broadcast
    // scalars; ranking is a global top-k (TakeOrdered), no window.
    "text_bm25" -> ((s, dir) => {
      import s.implicits._
      val qterms = Seq("dup", "query", "column", "hash")
      val en = Tables.load(s, dir, "documents").filter($"lang" === "en")
      val dls = en.select($"doc_id",
        size(split(lower($"text"), " ")).cast(LongType).as("dl"))
      val tok = en.select($"doc_id",
          explode(split(lower($"text"), " ")).as("term"))
        .filter($"term".isin(qterms: _*))
      val tf = tok.groupBy($"doc_id", $"term")
        .agg(count(lit(1)).as("tf"))
      val dfq = tok.distinct().groupBy($"term")
        .agg(count(lit(1)).as("df"))
      val stats = dls.agg(count(lit(1)).as("nd"), sum($"dl").as("st"))
      val contrib = tf
        .join(broadcast(dfq), "term")
        .join(dls, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("num",
          (lit(2L) * $"nd" - lit(2L) * $"df" + 1L) *
            (lit(44L) * $"tf" * $"st"))
        .withColumn("den",
          (lit(2L) * $"df" + 1L) *
            (lit(20L) * $"tf" * $"st" + lit(6L) * $"st" +
             lit(18L) * $"dl" * $"nd"))
        .withColumn("c", $"num".cast(DoubleType) / $"den".cast(DoubleType))
      def piv(t: String) =
        coalesce(max(when($"term" === t, $"c")), lit(0.0)).as(s"s_$t")
      contrib.groupBy($"doc_id", $"dl")
        .agg(piv("dup"), piv("query"), piv("column"), piv("hash"))
        .withColumn("score",
          $"s_dup" + $"s_query" + $"s_column" + $"s_hash")
        .orderBy($"score".desc, $"doc_id")
        .limit(10)
        .select($"doc_id", $"dl", round($"score", 9).as("score_r"))
    }),

    // Near-dup pairs: identical token SETS (order/multiplicity
    // insensitive ⇒ Jaccard = 1.0) via 64-bit set-fingerprint
    // blocking; see scale note in the header.
    "dedup_near" -> ((s, dir) => {
      import s.implicits._
      TextBlocking.maskPairs(s, dir)
        .select($"da", $"db", $"n_tokens")
        .orderBy($"da", $"db")
    }),

    // SemDeDup end-to-end: cluster-blocked cosine edges (IVF cell ×
    // sign bucket, never all-pairs) → shared min-label components →
    // per-vector keep/drop with the canonical min-id representative.
    // This is the embedding twin of dedup_minhash_cluster: detection
    // AND removal semantics, not a pair report. Every vector appears
    // (singletons are kept rows) — the relation a pipeline joins back
    // onto the corpus to drop semantic duplicates. Thin adapter over
    // the public api.VectorSearch.semanticDedup — the DuckDB oracle
    // proves the API function, not just the keyed demo.
    "dedup_semantic" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "embeddings")
        .select($"vec_id", $"label".cast(LongType).as("label"))
        .join(semanticDedupRel(s, dir)
                .select($"c_id".as("vec_id"), $"comp", $"keep"),
              Seq("vec_id"))
        .orderBy($"vec_id")
    }),

    // L2 norm per embedding (fused codegen fnorm2 — same sequential
    // fold as the HOF form, see functions/VectorExpressions), per-label
    // stats over 6-decimal-rounded norms (order-free decimal summation).
    "vec_norm" -> ((s, dir) => {
      import s.implicits._
      graft.functions.VectorExpressions.register(s)
      Tables.load(s, dir, "embeddings")
        .withColumn("norm", sqrt(expr("fnorm2(embedding)")))
        .withColumn("norm_r", round($"norm", 6).cast(DecimalType(18, 6)))
        .groupBy($"label")
        .agg(count(lit(1)).as("n_vecs"),
             (sum($"norm_r").cast(DoubleType) / count(lit(1)))
               .as("mean_norm"),
             min($"norm_r").cast(DoubleType).as("min_norm"),
             max($"norm_r").cast(DoubleType).as("max_norm"))
        .orderBy($"label")
    }),

    // Brute-force cosine top-5 for a BOUNDED query side (vec_id < 10,
    // broadcast) against all candidates — one candidate scan, window
    // top-k per query. Folds are sequential ⇒ cosines bit-identical
    // cross-engine, so ranking on the raw double is safe.
    // Thin adapter over graft.api.VectorSearch.knnCosine (r8) — the
    // DuckDB oracle proves the API function, not just the keyed demo.
    "vec_knn" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      graft.api.VectorSearch.knnCosine(
          e.filter($"vec_id" < 10), e, k = 5,
          qIdCol = "vec_id", qVecCol = "embedding",
          cIdCol = "vec_id", cVecCol = "embedding")
        .select($"q_id", $"rank", $"c_id", round($"cos", 6).as("cos_r"))
        .orderBy($"q_id", $"rank")
    }),

    // Hyperplane LSH ANN (r16; Charikar STOC'02 random-projection
    // family): the TRAINING-FREE complement to the IVF path — no
    // centroid/codebook build, so it works on day-0 corpora and
    // streaming inserts where k-means hasn't run. L=4 tables × b=6
    // signed projections; the ±1 hyperplanes derive from md5 of the
    // (table, bit, dim) index — deterministic, engine-independent,
    // and actually independent across planes (a multiplicative-LCG
    // parity stays LINEAR in the plane index, which made two planes
    // bit-identical — measured, hence md5). Scale shape: bucket ids
    // are a pure MAP-SIDE fold per vector (24 sequential fdot folds,
    // zero shuffle); the bounded query side broadcasts, so candidate
    // generation is one broadcast-hash probe of the corpus + a
    // distinct on the (tiny) collision set; only candidates pay the
    // exact cosine. At 100 TB the buckets partition the corpus the
    // way the IVF cells do, but with no model artifact to ship.
    // n_cand exposes the per-query candidate volume (the knob b/L
    // trade recall against), oracled exactly.
    "vec_lsh" -> ((s, dir) => {
      import s.implicits._
      graft.functions.VectorExpressions.register(s)
      val e = Tables.load(s, dir, "embeddings")
        .select($"vec_id", $"embedding",
          expr("fnorm2(embedding)").as("ss"))
      val buckets = lshBuckets(e)
      val cand = broadcast(
          buckets.filter($"vec_id" < 10)
            .select($"vec_id".as("q_id"), $"t", $"bkt"))
        .join(buckets.select($"vec_id".as("c_id"), $"t", $"bkt"),
          Seq("t", "bkt"))
        .filter($"q_id" =!= $"c_id")
        .select($"q_id", $"c_id").distinct()
      val scored = cand
        .join(broadcast(e.select($"vec_id".as("q_id"),
          $"embedding".as("qe"), $"ss".as("qss"))), Seq("q_id"))
        .join(e.select($"vec_id".as("c_id"),
          $"embedding".as("ce"), $"ss".as("css")), Seq("c_id"))
        .select($"q_id", $"c_id",
          (expr("fdot(qe, ce)") / sqrt($"qss" * $"css")).as("cos"))
      scored
        .withColumn("n_cand",
          count(lit(1)).over(Window.partitionBy($"q_id")))
        .withColumn("rank", row_number().over(
          Window.partitionBy($"q_id").orderBy($"cos".desc, $"c_id")))
        .filter($"rank" <= 5)
        .select($"q_id", $"rank".cast(LongType).as("rank"), $"c_id",
          round($"cos", 6).as("cos_r"), $"n_cand")
        .orderBy($"q_id", $"rank")
    }),

    // vec_lsh over the WRITTEN (t, bkt)-partitioned bucket index — a
    // LAYOUT variant (identical semantics and oracle SQL): each
    // bucket directory holds its member vectors, the session-cached
    // query-bucket probe broadcasts with its selective predicate
    // restated above the cache boundary (the vec_knn_ivf_table r16
    // discipline), and the index scan dynamic-partition-prunes to
    // exactly the query batch's bucket union — at 100 TB the bucket
    // index IS the corpus, and reading 40 of 256 directories instead
    // of all of them is the IO an LSH service exists to delete. The
    // per-collision cosine is computed BEFORE the (q, c) table-dedup
    // (identical value in every colliding table, so max() is the
    // dedup), which lets the index carry vectors and the probe never
    // re-join the corpus. Cold cost moves to the one-time table
    // write (the offline index build).
    "vec_lsh_table" -> ((s, dir) => {
      import s.implicits._
      graft.functions.VectorExpressions.register(s)
      val idx = lshIndexTable(s, dir)
      val qb = graft.SessionCache.cached(s, s"lsh.probe:$dir") {
        val bktCols = (0 until lshTables).map(lshBucketCol)
        Tables.load(s, dir, "embeddings")
          .filter($"vec_id" < 10)
          .select($"vec_id".as("q_id"), $"embedding",
            expr("fnorm2(embedding)").as("qss"))
          .select($"q_id", $"embedding".as("qe"), $"qss",
            posexplode(array(bktCols: _*)).as(Seq("t", "bkt")))
      }
      // Restated bound: a no-op over the cache's content, but
      // PartitionPruning only plans a DPP subquery when it can SEE a
      // selective predicate on the dim side (knnIvfQuery's lesson).
      val qbQ = qb.filter($"q_id" < 10)
      val scored = broadcast(qbQ).join(idx, Seq("t", "bkt"))
        .filter($"q_id" =!= $"c_id")
        .select($"q_id", $"c_id",
          (expr("fdot(qe, ce)") / sqrt($"qss" * $"css")).as("cos"))
        .groupBy($"q_id", $"c_id").agg(max($"cos").as("cos"))
      scored
        .withColumn("n_cand",
          count(lit(1)).over(Window.partitionBy($"q_id")))
        .withColumn("rank", row_number().over(
          Window.partitionBy($"q_id").orderBy($"cos".desc, $"c_id")))
        .filter($"rank" <= 5)
        .select($"q_id", $"rank".cast(LongType).as("rank"), $"c_id",
          round($"cos", 6).as("cos_r"), $"n_cand")
        .orderBy($"q_id", $"rank")
    }),

    // MMR diversified re-rank (r11d; Carbonell & Goldstein SIGIR'98):
    // retrieval's second stage — a raw top-k is often near-duplicate
    // spam (the corpus IS full of near-dups; that's why the dedup
    // family exists), so the picks greedily trade relevance against
    // similarity-to-already-picked: score = 0.7·rel − 0.3·max_sim.
    // Scale shape: the expensive part stays the FIRST stage (any of
    // vec_knn/vec_knn_ivf/vec_ivfpq); MMR itself runs entirely on the
    // shortlist — 20 candidates and 20×19 pairwise sims per query,
    // bounded per query regardless of corpus size, all broadcast-
    // sized relations. The greedy rounds are UNROLLED (fixed pick
    // count), each one anti-join + max-aggregate + argmax window over
    // shortlist-sized frames — the same fixed-iteration discipline as
    // pagerank/BFS/kcore, so the DuckDB oracle replays the identical
    // rounds; relevance and pairwise sims reuse vec_knn's fold-equal
    // cosine arithmetic, and every pick tie-breaks on c_id.
    "vec_rerank_mmr" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val shortlist = graft.SessionCache.cached(s, s"mmr.short:$dir") {
        graft.api.VectorSearch.knnCosine(
          e.filter($"vec_id" < 10), e, k = mmrShort,
          qIdCol = "vec_id", qVecCol = "embedding",
          cIdCol = "vec_id", cVecCol = "embedding")
          .select($"q_id", $"c_id", $"cos".as("rel"))
      }
      val sims = graft.SessionCache.cached(s, s"mmr.sims:$dir") {
        graft.functions.VectorExpressions.register(s)
        val sc = shortlist.join(
            e.select($"vec_id", $"embedding".as("ce"),
              expr("fnorm2(embedding)").as("css")),
            $"c_id" === $"vec_id")
          .select($"q_id", $"c_id", $"ce", $"css")
        sc.select($"q_id", $"c_id".as("a"), $"ce".as("ae"),
            $"css".as("ass"))
          .join(sc.select($"q_id".as("q2"), $"c_id".as("b"),
              $"ce".as("be"), $"css".as("bss")),
            $"q_id" === $"q2" && $"a" =!= $"b")
          .select($"q_id", $"a", $"b",
            (expr("fdot(ae, be)") / sqrt($"ass" * $"bss")).as("sim"))
      }
      graft.api.VectorSearch.mmrRerank(shortlist, sims, mmrPicks)
        .select($"q_id", $"pick", $"c_id",
          round($"score", 6).as("score_r"))
        .orderBy($"q_id", $"pick")
    }),

    // IVF-style approximate kNN — the 100-TB scale path for
    // similarity search: a coarse quantizer (the deterministic
    // integer-quantized label centroids; a k-means codebook in a real
    // pipeline) partitions the candidate side; each query probes only
    // its 3 nearest cells, so search cost is (probed fraction) × N
    // instead of N. Same bounded query side and sequential-fold
    // cosine arithmetic as vec_knn, so the result is exactly
    // reproducible in the DuckDB mirror.
    "vec_knn_ivf" -> ((s, dir) =>
      // Candidate assignment: the shared session-cached inverted-list
      // index (one scan, built once — vec_ivfpq probes the same one).
      knnIvfQuery(s, dir, ivfCells(s, dir))),

    // vec_knn_ivf over the WRITTEN, cell-partitioned index table
    // (r15, verdict item 3): identical semantics and oracle SQL — a
    // LAYOUT variant. The probe join's scan carries a
    // dynamicpruningexpression on the partition column (law-pinned in
    // PlanSnapshot-style R15 tests), so only the probed cells' files
    // are listed/scanned — the on-disk inverted-list read pattern a
    // billion-vector IVF deployment actually runs. Cold cost moves to
    // the one-time table write (the offline index build).
    "vec_knn_ivf_table" -> ((s, dir) =>
      knnIvfQuery(s, dir, ivfCellsTable(s, dir))),

    // Scalar uint8 quantization of each embedding to its per-vector
    // [min, max] range — the 4× storage/bandwidth reduction an ANN
    // index applies before shipping vectors at scale. Pure map-side
    // HOFs (transform + fold), no shuffle besides the contract ORDER
    // BY; checksums are exact integer folds, and the float pipeline
    // (sub/mul/div/floor, fixed association order) is IEEE
    // correctly-rounded, hence bit-identical cross-engine.
    "vec_quantize" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "embeddings")
        .withColumn("mn", expr("CAST(array_min(embedding) AS DOUBLE)"))
        .withColumn("mx", expr("CAST(array_max(embedding) AS DOUBLE)"))
        .withColumn("q", expr(
          "transform(embedding, x -> CASE WHEN mx = mn THEN 0L ELSE " +
            "CAST(floor(((CAST(x AS DOUBLE) - mn) * 255.0D) / (mx - mn)) " +
            "AS BIGINT) END)"))
        .select($"vec_id", $"label".cast(LongType).as("label"),
          size($"q").cast(LongType).as("n_dims"),
          expr("aggregate(q, 0L, (a, v) -> a + v)").as("q_sum"),
          expr("array_min(q)").as("q_min"),
          expr("array_max(q)").as("q_max"))
        .orderBy($"vec_id")
    }),

    // Product quantization (PQ — Jégou et al., TPAMI'11 layout): the
    // 64-dim space splits into m=4 contiguous 16-dim subspaces, each
    // with its own 10-entry codebook (per-label quantized-mean
    // centroids, same deterministic construction as vec_centroid);
    // every vector compresses to 4 one-byte codes (16× vs float32).
    // Scale: subvectors are SLICED map-side (no explode/regroup
    // shuffle); the 40-row codebook broadcasts; assignment is a
    // per-row argmin over 10 sequential 16-dim folds — one narrow
    // pass over the corpus, embarrassingly parallel. Output is one
    // row per (vec_id, subspace) with the code and its rounded
    // squared reconstruction distance.
    "vec_pq" -> ((s, dir) => {
      import s.implicits._
      pqCodes(s, dir)
        .select($"vec_id", $"q",
          $"clabel".cast(IntegerType).as("code"),
          round($"d", 6).as("err_r"))
        .orderBy($"vec_id", $"q")
    }),

    // IVF-PQ with asymmetric distance computation + exact re-rank
    // (r7) — the composition that actually runs billion-vector ANN
    // (Jégou et al., TPAMI'11 §V): the coarse IVF index prunes the
    // corpus to 3 probed cells; the SHORTLIST stage ranks candidates
    // from their one-byte-per-subspace PQ codes alone (m=8 × 8-dim
    // subspaces, 256-entry codebooks) via a per-query ADC lookup
    // table, never touching candidate floats; only the top-50
    // shortlist pays an exact distance for the final top-5. Design
    // choices forced by the fixture (measured, r7): per-label
    // codebooks give recall 0.08 — the labels carry no geometric
    // structure, so every centroid ≈ 0 and ADC ranking is noise;
    // 256-entry orthant codebooks (code cell = sign pattern of the 8
    // subspace dims, centroid = cell mean, encode = OWN orthant in
    // O(N·d) — the k×-costlier 256-way argmin encode only bought
    // 0.98 vs 0.92 under r7's measurement) make ADC@50 + exact
    // re-rank LOSSLESS on top of the coarse index: relative recall
    // vs vec_knn_ivf measured 1.0 at sf0.001 and sf0.01 (r16 law,
    // floor ≥0.9 in PropertyLawsSpec; absolute recall vs brute force
    // is the coarse index's 3-of-10-cell pruning on a structureless
    // fixture, lawed separately at ≥0.3).
    // Determinism: subspace distances come back as 8 PIVOTED columns
    // summed in fixed association (no order-nondeterministic double
    // SUM); every fold is the sequential HOF ↔ list_reduce pair.
    // Scale: cells + codes are session-cached build-once index
    // artifacts (cells shared with vec_knn_ivf); per query the scan is
    // |probed cells| × 8 bytes of codes (bandwidth, not FLOPs) and 50
    // raw vectors.
    "vec_ivfpq" -> ((s, dir) => {
      import s.implicits._
      ivfpqQuery(s, dir,
        ivfCells(s, dir).select($"cell", $"c_id"),
        pq8Codes(s, dir).select($"vec_id".as("c_id"), $"q", $"clabel"))
    }),

    // vec_ivfpq over the WRITTEN index tables (r15, verdict item 3):
    // identical semantics and oracle SQL — a LAYOUT variant. The
    // inverted lists come from the cell-partitioned table (probe scan
    // dynamic-partition-prunes to the probed cells) and the PQ codes
    // from the c_id-bucketed+sorted table, so the corpus-sized code
    // relation feeds the shortlist SMJ with ZERO exchange and ZERO
    // sort (law-pinned in R15IndexTableSpec) — at 100 TB the 8-byte
    // codes ARE the bandwidth budget, and never reshuffling them is
    // the difference between an index probe and a corpus shuffle per
    // query batch. Cold cost moves to the one-time table writes (the
    // offline index build a real ANN deployment runs).
    "vec_ivfpq_bucketed" -> ((s, dir) => {
      import s.implicits._
      ivfpqQuery(s, dir,
        ivfCellsTable(s, dir).select($"cell", $"c_id"),
        pq8CodesTable(s, dir).hint("merge"))
    }),

    // Per-label centroids from integer-quantized (1e-7) per-dimension
    // sums — exact, order-free, mergeable — plus the fraction of each
    // label's vectors whose nearest centroid is their own label.
    "vec_centroid" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "embeddings")
      val cent = quantCentroids(e)
      val assigned = e.crossJoin(broadcast(centroidArrays(cent)))
        .withColumn("dist", sqdistToCentroid)
        .withColumn("rn", row_number().over(
          Window.partitionBy($"vec_id").orderBy($"dist", $"cl")))
        .filter($"rn" === 1)
        .select($"vec_id", $"label", $"cl")
      val frac = assigned.groupBy($"label")
        .agg(count(lit(1)).as("n_vecs"),
             (sum(when($"cl" === $"label", 1L).otherwise(0L))
               .cast(DoubleType) / count(lit(1))).as("frac_own"))
      cent.join(frac, "label")
        .select($"label", $"pos".cast(LongType).as("pos"), $"cq",
                $"n_vecs", $"frac_own")
        .orderBy($"label", $"pos")
    }))

  /** The written-table keys are LAYOUT variants: same semantics,
    * same oracle SQL as their session-cached twins (the
    * graph_jaccard_bucketed precedent — DuckDB proves each
    * independently, the R15 law proves them against each other). */
  def oracle: Seq[(String, String)] = {
    val m = oracleBase.toMap
    oracleBase ++ Seq(
      "vec_knn_ivf_table" -> m("vec_knn_ivf"),
      "vec_ivfpq_bucketed" -> m("vec_ivfpq"),
      "vec_lsh_table" -> m("vec_lsh"))
  }

  private def oracleBase: Seq[(String, String)] = Seq(
    "text_ngrams" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ')
        |    AS t FROM documents),
        |bg AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
        |  FROM toks, unnest(range(1, len(t))) AS r(i)
        |  WHERE len(t) >= 2),
        |agg AS (SELECT bigram, count(*) AS n_occ,
        |    count(DISTINCT doc_id) AS n_docs
        |  FROM bg GROUP BY bigram
        |  ORDER BY n_occ DESC, bigram LIMIT 100)
        |SELECT row_number() OVER (ORDER BY n_occ DESC, bigram) AS rk,
        |  bigram, n_occ, n_docs
        |FROM agg ORDER BY rk""".stripMargin,

    "text_wordcount" ->
      """SELECT term, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents WHERE lang = 'en') t
        |WHERE term <> '' GROUP BY term
        |ORDER BY cnt DESC, term LIMIT 50""".stripMargin,

    "text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
        |  CAST(sum(n_tok) AS BIGINT) AS sum_tok,
        |  CAST(sum(n_tok) AS DOUBLE) / count(*) AS avg_tok,
        |  max(n_tok) AS max_tok
        |FROM (SELECT lang, source, n_chars,
        |        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |      FROM documents) t
        |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    "text_tfidf" ->
      """WITH en AS (SELECT * FROM documents WHERE lang = 'en'),
        |tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |        FROM en),
        |tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df
        |          FROM (SELECT DISTINCT doc_id, term FROM tok2) GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM en),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    CAST(floor(((tf.tf * 1000000.0) * (n.n_docs + 1)) / (dfreq.df + 1))
        |         AS BIGINT) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rn FROM scored)
        |SELECT doc_id, term AS top_term, tf, df, score
        |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // Same all-integer num/den per term and the same fixed-association
    // 4-column sum as the Spark side; every intermediate is BIGINT.
    "text_bm25" ->
      """WITH en AS (SELECT doc_id, lower(text) AS t
        |           FROM documents WHERE lang = 'en'),
        |dls AS (SELECT doc_id,
        |          CAST(len(string_split(t, ' ')) AS BIGINT) AS dl FROM en),
        |tok AS (SELECT doc_id, unnest(string_split(t, ' ')) AS term
        |        FROM en),
        |tokq AS (SELECT doc_id, term FROM tok
        |         WHERE term IN ('dup', 'query', 'column', 'hash')),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tokq GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df
        |        FROM (SELECT DISTINCT doc_id, term FROM tokq) GROUP BY term),
        |stats AS (SELECT count(*) AS nd, CAST(sum(dl) AS BIGINT) AS st
        |          FROM dls),
        |contrib AS (
        |  SELECT tf.doc_id, dls.dl, tf.term,
        |    CAST((2 * nd - 2 * df + 1) * (44 * tf * st) AS DOUBLE) /
        |    CAST((2 * df + 1) *
        |         (20 * tf * st + 6 * st + 18 * dl * nd) AS DOUBLE) AS c
        |  FROM tf JOIN dfq USING (term) JOIN dls USING (doc_id)
        |  CROSS JOIN stats),
        |piv AS (
        |  SELECT doc_id, dl,
        |    COALESCE(max(CASE WHEN term = 'dup' THEN c END), 0.0) AS s_dup,
        |    COALESCE(max(CASE WHEN term = 'query' THEN c END), 0.0) AS s_query,
        |    COALESCE(max(CASE WHEN term = 'column' THEN c END), 0.0) AS s_column,
        |    COALESCE(max(CASE WHEN term = 'hash' THEN c END), 0.0) AS s_hash
        |  FROM contrib GROUP BY doc_id, dl)
        |SELECT doc_id, dl,
        |  round(s_dup + s_query + s_column + s_hash, 9) AS score_r
        |FROM piv
        |ORDER BY s_dup + s_query + s_column + s_hash DESC, doc_id
        |LIMIT 10""".stripMargin,

    "dedup_near" ->
      s"""WITH ${TextBlocking.maskCteSql}
        |SELECT a.doc_id AS da, b.doc_id AS db, a.n_tokens
        |FROM m a JOIN m b ON a.mask = b.mask AND a.doc_id < b.doc_id
        |ORDER BY da, db""".stripMargin,

    // Mirror of semanticPairs (cells from the vec_knn_ivf codebook
    // construction, sign bucket from dedup_embed's) feeding the shared
    // unrolled min-label closure (DedupCluster.closureSql).
    "dedup_semantic" ->
      s"""WITH e AS (SELECT vec_id, embedding,
        |    (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
        |  + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
        |  + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
        |  + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
        |  + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
        |  + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
        |  + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
        |  + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END)
        |    AS bucket,
        |    list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (a, b) -> a + b) AS ss FROM embeddings),
        |flat AS (
        |  SELECT label, i - 1 AS pos,
        |    floor(CAST(embedding[i] AS DOUBLE) * 1e7) AS xq
        |  FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)),
        |cent AS (
        |  SELECT label, pos,
        |    CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE) / count(*) / 1e7 AS cq
        |  FROM flat GROUP BY label, pos),
        |centarr AS (
        |  SELECT label AS cl, list(cq ORDER BY pos) AS carr
        |  FROM cent GROUP BY label),
        |dists AS (
        |  SELECT e.vec_id, e.embedding, e.ss, e.bucket, ca.cl,
        |    list_reduce(list_transform(list_zip(e.embedding, ca.carr),
        |      p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])),
        |      (a, b) -> a + b) AS d
        |  FROM e CROSS JOIN centarr ca),
        |cells AS MATERIALIZED (
        |  SELECT cl AS cell, bucket, vec_id, embedding, ss
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY d, cl) AS rn FROM dists) WHERE rn = 1),
        |pairs AS (
        |  SELECT a.vec_id AS da, b.vec_id AS db
        |  FROM cells a JOIN cells b
        |    ON a.cell = b.cell AND a.bucket = b.bucket
        |   AND a.vec_id < b.vec_id
        |  WHERE list_reduce(list_transform(
        |      list_zip(a.embedding, b.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
        |      (x, y) -> x + y) / sqrt(a.ss * b.ss) >= 0.3),
        |bi AS MATERIALIZED (SELECT da AS a, db AS b FROM pairs
        |  UNION ALL SELECT db AS a, da AS b FROM pairs),
        |${DedupCluster.closureSql()}
        |SELECT emb.vec_id, CAST(emb.label AS BIGINT) AS label,
        |  COALESCE(c.l, emb.vec_id) AS comp,
        |  COALESCE(c.l, emb.vec_id) = emb.vec_id AS keep
        |FROM embeddings emb
        |LEFT JOIN ${DedupCluster.closureFinalCte()} c ON emb.vec_id = c.n
        |ORDER BY emb.vec_id""".stripMargin,

    "vec_quantize" ->
      """WITH e AS (SELECT vec_id, label, embedding,
        |    CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
        |    CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx
        |  FROM embeddings),
        |q AS (SELECT vec_id, label,
        |    list_transform(embedding, x ->
        |      CASE WHEN mx = mn THEN 0
        |           ELSE CAST(floor(((CAST(x AS DOUBLE) - mn) * 255.0)
        |                           / (mx - mn)) AS BIGINT) END) AS qs
        |  FROM e)
        |SELECT vec_id, CAST(label AS BIGINT) AS label,
        |  CAST(len(qs) AS BIGINT) AS n_dims,
        |  CAST(COALESCE(list_sum(qs), 0) AS BIGINT) AS q_sum,
        |  CAST(list_aggregate(qs, 'min') AS BIGINT) AS q_min,
        |  CAST(list_aggregate(qs, 'max') AS BIGINT) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin,

    // Same subspace split, quantized-mean codebook, and ordered
    // sequential fold as the Spark side (0.0-seeded aggregate ==
    // init-less list_reduce under +).
    "vec_pq" ->
      """WITH flat AS (
        |  SELECT vec_id, label, i - 1 AS pos,
        |    CAST((i - 1) // 16 AS INTEGER) AS q,
        |    CAST(embedding[i] AS DOUBLE) AS x,
        |    floor(CAST(embedding[i] AS DOUBLE) * 1e7) AS xq
        |  FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)),
        |cent AS (
        |  SELECT label AS clabel, q, pos,
        |    (CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE) / count(*)) / 1e7
        |      AS cq
        |  FROM flat GROUP BY clabel, q, pos),
        |centarr AS (
        |  SELECT clabel, q, list(cq ORDER BY pos) AS carr
        |  FROM cent GROUP BY clabel, q),
        |subv AS (
        |  SELECT vec_id, q, list(x ORDER BY pos) AS v
        |  FROM flat GROUP BY vec_id, q),
        |dists AS (
        |  SELECT s.vec_id, s.q, ca.clabel,
        |    list_reduce(list_transform(list_zip(s.v, ca.carr),
        |      p -> (p[1] - p[2]) * (p[1] - p[2])),
        |      (a, b) -> a + b) AS d
        |  FROM subv s JOIN centarr ca USING (q)),
        |ranked AS (SELECT *, row_number() OVER (
        |    PARTITION BY vec_id, q ORDER BY d, clabel) AS rn
        |  FROM dists)
        |SELECT vec_id, q, CAST(clabel AS INTEGER) AS code,
        |  round(d, 6) AS err_r
        |FROM ranked WHERE rn = 1 ORDER BY vec_id, q""".stripMargin,

    // Composition of the vec_knn_ivf coarse CTEs with the m=8
    // orthant-seeded codebook; the ADC total uses the same pivoted
    // fixed-association 8-column sum as the Spark side, and the
    // re-rank fold mirrors the Spark zip_with exactly.
    "vec_ivfpq" ->
      """WITH flat AS (
        |  SELECT label, i - 1 AS pos,
        |    floor(CAST(embedding[i] AS DOUBLE) * 1e7) AS xq
        |  FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)),
        |cent AS (
        |  SELECT label, pos,
        |    CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE) / count(*) / 1e7 AS cq
        |  FROM flat GROUP BY label, pos),
        |centarr AS (
        |  SELECT label AS cl, list(cq ORDER BY pos) AS carr
        |  FROM cent GROUP BY label),
        |cdists AS (
        |  SELECT e.vec_id, ca.cl,
        |    list_reduce(list_transform(list_zip(e.embedding, ca.carr),
        |      p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])),
        |      (a, b) -> a + b) AS d
        |  FROM embeddings e CROSS JOIN centarr ca),
        |cells AS (
        |  SELECT cl AS cell, vec_id AS c_id
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY d, cl) AS rn FROM cdists) WHERE rn = 1),
        |probe AS (
        |  SELECT vec_id AS q_id, cl AS cell
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY d, cl) AS rn FROM cdists WHERE vec_id < 10)
        |  WHERE rn <= 3),
        |pqflat AS (
        |  SELECT vec_id, i - 1 AS pos,
        |    CAST((i - 1) // 8 AS INTEGER) AS q,
        |    CAST(embedding[i] AS DOUBLE) AS x,
        |    floor(CAST(embedding[i] AS DOUBLE) * 1e7) AS xq
        |  FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)),
        |subv AS (
        |  SELECT vec_id, q, list(x ORDER BY pos) AS v
        |  FROM pqflat GROUP BY vec_id, q),
        |sig AS (
        |  SELECT vec_id, q,
        |    CAST(list_reduce(list_transform(v,
        |      x -> CASE WHEN x > 0 THEN 1 ELSE 0 END),
        |      (a, b) -> a * 2 + b) AS INTEGER) AS b
        |  FROM subv),
        |pqcent AS (
        |  SELECT s.b AS clabel, f.q, f.pos,
        |    (CAST(CAST(sum(f.xq) AS BIGINT) AS DOUBLE) / count(*)) / 1e7
        |      AS cq
        |  FROM pqflat f JOIN sig s ON f.vec_id = s.vec_id AND f.q = s.q
        |  GROUP BY s.b, f.q, f.pos),
        |pqcarr AS (
        |  SELECT clabel, q, list(cq ORDER BY pos) AS carr
        |  FROM pqcent GROUP BY clabel, q),
        |codes AS (
        |  SELECT vec_id AS c_id, q, b AS clabel FROM sig),
        |adc AS (
        |  SELECT s.vec_id AS q_id, s.q, ca.clabel,
        |    list_reduce(list_transform(list_zip(s.v, ca.carr),
        |      p -> (p[1] - p[2]) * (p[1] - p[2])),
        |      (a, b) -> a + b) AS dq
        |  FROM subv s JOIN pqcarr ca USING (q) WHERE s.vec_id < 10),
        |dd AS (
        |  SELECT pr.q_id, ce.c_id, co.q, adc.dq
        |  FROM probe pr JOIN cells ce USING (cell)
        |  JOIN codes co USING (c_id)
        |  JOIN adc ON adc.q_id = pr.q_id AND adc.q = co.q
        |          AND adc.clabel = co.clabel
        |  WHERE pr.q_id <> ce.c_id),
        |piv AS (
        |  SELECT q_id, c_id,
        |    max(CASE WHEN q = 0 THEN dq END) AS d0,
        |    max(CASE WHEN q = 1 THEN dq END) AS d1,
        |    max(CASE WHEN q = 2 THEN dq END) AS d2,
        |    max(CASE WHEN q = 3 THEN dq END) AS d3,
        |    max(CASE WHEN q = 4 THEN dq END) AS d4,
        |    max(CASE WHEN q = 5 THEN dq END) AS d5,
        |    max(CASE WHEN q = 6 THEN dq END) AS d6,
        |    max(CASE WHEN q = 7 THEN dq END) AS d7
        |  FROM dd GROUP BY q_id, c_id),
        |short AS (
        |  SELECT q_id, c_id
        |  FROM (SELECT q_id, c_id,
        |          row_number() OVER (PARTITION BY q_id
        |            ORDER BY d0 + d1 + d2 + d3 + d4 + d5 + d6 + d7, c_id)
        |            AS srk
        |        FROM piv) WHERE srk <= 50),
        |rer AS (
        |  SELECT sh.q_id, sh.c_id,
        |    list_reduce(list_transform(list_zip(q.embedding, c.embedding),
        |      p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) *
        |           (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
        |      (a, b) -> a + b) AS l2
        |  FROM short sh
        |  JOIN embeddings q ON q.vec_id = sh.q_id
        |  JOIN embeddings c ON c.vec_id = sh.c_id),
        |fin AS (
        |  SELECT q_id, c_id, l2,
        |    row_number() OVER (PARTITION BY q_id ORDER BY l2, c_id)
        |      AS rank
        |  FROM rer)
        |SELECT q_id, rank, c_id, round(l2, 6) AS l2_r
        |FROM fin WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "vec_norm" ->
      """WITH v AS (SELECT label,
        |  CAST(round(sqrt(list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (a, b) -> a + b)), 6) AS DECIMAL(18,6)) AS norm_r
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs,
        |  CAST(sum(norm_r) AS DOUBLE) / count(*) AS mean_norm,
        |  CAST(min(norm_r) AS DOUBLE) AS min_norm,
        |  CAST(max(norm_r) AS DOUBLE) AS max_norm
        |FROM v GROUP BY label ORDER BY label""".stripMargin,

    "vec_rerank_mmr" -> {
      // Rounds 2..mmrPicks generated from the same constants as the
      // Spark loop (the pagerank shared-template discipline).
      val rounds = (2 to mmrPicks).map { r =>
        s"""ms$r AS MATERIALIZED (SELECT s.q_id, s.a, max(s.sim) AS ms
           |  FROM sims s JOIN cum${r - 1} c
           |    ON s.q_id = c.q_id AND s.b = c.c_id
           |  GROUP BY s.q_id, s.a),
           |cand$r AS (SELECT sh.q_id, sh.c_id,
           |    sh.rel * 0.7 - m.ms * 0.3 AS score
           |  FROM short sh JOIN ms$r m
           |    ON sh.q_id = m.q_id AND sh.c_id = m.a
           |  WHERE NOT EXISTS (SELECT 1 FROM cum${r - 1} c
           |    WHERE c.q_id = sh.q_id AND c.c_id = sh.c_id)),
           |sel$r AS (SELECT q_id, $r AS pick, c_id, score FROM (
           |    SELECT *, row_number() OVER (PARTITION BY q_id
           |      ORDER BY score DESC, c_id) AS rn FROM cand$r)
           |  WHERE rn = 1),
           |cum$r AS MATERIALIZED (SELECT * FROM cum${r - 1}
           |  UNION ALL SELECT * FROM sel$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding,
        |    list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (a, b) -> a + b) AS ss FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_reduce(list_transform(list_zip(q.embedding, c.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
        |      (a, b) -> a + b) / sqrt(q.ss * c.ss) AS rel
        |  FROM e q CROSS JOIN e c
        |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |short AS MATERIALIZED (SELECT q_id, c_id, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY rel DESC, c_id) AS rank FROM pairs)
        |  WHERE rank <= $mmrShort),
        |sc AS MATERIALIZED (SELECT s.q_id, s.c_id,
        |    e.embedding AS ce, e.ss AS css
        |  FROM short s JOIN e ON s.c_id = e.vec_id),
        |sims AS MATERIALIZED (SELECT x.q_id, x.c_id AS a, y.c_id AS b,
        |    list_reduce(list_transform(list_zip(x.ce, y.ce),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
        |      (a2, b2) -> a2 + b2) / sqrt(x.css * y.css) AS sim
        |  FROM sc x JOIN sc y
        |    ON x.q_id = y.q_id AND x.c_id <> y.c_id),
        |cum1 AS MATERIALIZED (SELECT q_id, 1 AS pick, c_id,
        |    rel * 0.7 AS score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY rel DESC, c_id) AS rn FROM short)
        |  WHERE rn = 1),
        |$rounds
        |SELECT q_id, CAST(pick AS BIGINT) AS pick, c_id,
        |  round(score, 6) AS score_r
        |FROM cum$mmrPicks ORDER BY q_id, pick""".stripMargin
    },

    // The md5-parity plane, the sequential-fold projection and the
    // bucket fold all mirror the Spark side term-for-term; candidate
    // pairs and the exact re-rank replay the same DISTINCT + window.
    "vec_lsh" -> {
      s"""WITH pl AS (
        |  SELECT t, j, list(CASE WHEN strpos('02468ace',
        |      substr(md5(CAST(t AS VARCHAR) || '_' ||
        |        CAST(j AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 1))
        |      > 0 THEN CAST(1.0 AS DOUBLE) ELSE -1.0 END ORDER BY d)
        |    AS pv
        |  FROM generate_series(0, ${lshTables - 1}) tt(t),
        |       generate_series(0, ${lshBits - 1}) jj(j),
        |       generate_series(0, ${lshDims - 1}) dd(d)
        |  GROUP BY t, j),
        |e AS (SELECT vec_id, embedding,
        |  list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (a, b) -> a + b) AS ss FROM embeddings),
        |bits AS (
        |  SELECT e.vec_id, pl.t, pl.j,
        |    CASE WHEN list_reduce(list_transform(
        |        list_zip(e.embedding, pl.pv),
        |        p -> CAST(p[1] AS DOUBLE) * p[2]),
        |        (a, b) -> a + b) >= 0.0
        |      THEN CAST(1 AS BIGINT) << j ELSE 0 END AS bv
        |  FROM e CROSS JOIN pl),
        |bkt AS (SELECT vec_id, t, CAST(sum(bv) AS BIGINT) AS bkt
        |  FROM bits GROUP BY vec_id, t),
        |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
        |  FROM bkt q JOIN bkt c ON q.t = c.t AND q.bkt = c.bkt
        |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |nc AS (SELECT q_id, count(*) AS n_cand FROM cand GROUP BY q_id),
        |pairs AS (SELECT cand.q_id, cand.c_id,
        |    list_reduce(list_transform(
        |      list_zip(qe.embedding, ce.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
        |      (a, b) -> a + b) / sqrt(qe.ss * ce.ss) AS cos
        |  FROM cand
        |  JOIN e qe ON qe.vec_id = cand.q_id
        |  JOIN e ce ON ce.vec_id = cand.c_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |  ORDER BY cos DESC, c_id) AS rank FROM pairs)
        |SELECT r.q_id, r.rank, r.c_id, round(r.cos, 6) AS cos_r,
        |  nc.n_cand
        |FROM ranked r JOIN nc USING (q_id)
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
    },

    "vec_knn" ->
      """WITH e AS (SELECT vec_id, embedding,
        |  list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (a, b) -> a + b) AS ss FROM embeddings),
        |pairs AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_reduce(list_transform(list_zip(q.embedding, c.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
        |      (a, b) -> a + b) / sqrt(q.ss * c.ss) AS cos
        |  FROM e q CROSS JOIN e c
        |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |  ORDER BY cos DESC, c_id) AS rank FROM pairs)
        |SELECT q_id, rank, c_id, round(cos, 6) AS cos_r
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "vec_knn_ivf" ->
      """WITH e AS (SELECT vec_id, label, embedding,
        |    list_reduce(list_transform(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |      (a, b) -> a + b) AS ss FROM embeddings),
        |flat AS (
        |  SELECT label, i - 1 AS pos,
        |    floor(CAST(embedding[i] AS DOUBLE) * 1e7) AS xq
        |  FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)),
        |cent AS (
        |  SELECT label, pos,
        |    CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE) / count(*) / 1e7 AS cq
        |  FROM flat GROUP BY label, pos),
        |centarr AS (
        |  SELECT label AS cl, list(cq ORDER BY pos) AS carr
        |  FROM cent GROUP BY label),
        |dists AS (
        |  SELECT e.vec_id, e.embedding, e.ss, ca.cl,
        |    list_reduce(list_transform(list_zip(e.embedding, ca.carr),
        |      p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])),
        |      (a, b) -> a + b) AS d
        |  FROM e CROSS JOIN centarr ca),
        |cand AS (
        |  SELECT cl AS cell, vec_id AS c_id, embedding AS ce, ss AS css
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY d, cl) AS rn FROM dists) WHERE rn = 1),
        |probe AS (
        |  SELECT vec_id AS q_id, embedding AS qe, ss AS qss, cl AS cell
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY d, cl) AS rn FROM dists WHERE vec_id < 10)
        |  WHERE rn <= 3),
        |pairs AS (
        |  SELECT q_id, c_id,
        |    list_reduce(list_transform(list_zip(qe, ce),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
        |      (a, b) -> a + b) / sqrt(qss * css) AS cos
        |  FROM probe JOIN cand USING (cell) WHERE q_id <> c_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |  ORDER BY cos DESC, c_id) AS rank FROM pairs)
        |SELECT q_id, rank, c_id, round(cos, 6) AS cos_r
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,

    "vec_centroid" ->
      """WITH flat AS (
        |  SELECT vec_id, label, i - 1 AS pos,
        |    floor(CAST(embedding[i] AS DOUBLE) * 1e7) AS xq
        |  FROM embeddings CROSS JOIN generate_series(1, 64) AS g(i)),
        |cent AS (
        |  SELECT label, pos,
        |    CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE) / count(*) / 1e7 AS cq
        |  FROM flat GROUP BY label, pos),
        |centarr AS (
        |  SELECT label AS clabel, list(cq ORDER BY pos) AS carr
        |  FROM cent GROUP BY label),
        |assigned AS (
        |  SELECT vec_id, label, clabel, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY dist, clabel) AS rn
        |  FROM (
        |    SELECT e.vec_id, e.label, ca.clabel,
        |      list_reduce(list_transform(list_zip(e.embedding, ca.carr),
        |        p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2])),
        |        (a, b) -> a + b) AS dist
        |    FROM embeddings e CROSS JOIN centarr ca)),
        |frac AS (
        |  SELECT label, count(*) AS n_vecs,
        |    CAST(sum(CASE WHEN clabel = label THEN 1 ELSE 0 END) AS DOUBLE)
        |      / count(*) AS frac_own
        |  FROM assigned WHERE rn = 1 GROUP BY label)
        |SELECT cent.label, CAST(cent.pos AS BIGINT) AS pos, cent.cq,
        |  frac.n_vecs, frac.frac_own
        |FROM cent JOIN frac ON cent.label = frac.label
        |ORDER BY cent.label, pos""".stripMargin)
}
