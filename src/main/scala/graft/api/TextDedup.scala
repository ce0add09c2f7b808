package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable, parameterized text-deduplication building blocks — the
  * public library surface behind the oracled `dedup_*` query keys
  * (SURVEY.md §2.H/§2.K). Everything is DataFrame-in / DataFrame-out
  * with caller-named input columns and documented output columns, so a
  * user can run the same pipelines over their own tables; the keyed
  * queries in `operators.TrainQueries` are thin adapters over these
  * functions, which keeps the DuckDB oracles as the equivalence proof
  * for BOTH surfaces.
  *
  * Determinism contract (same as the packs, SURVEY.md §7.4): pure
  * integer hashing — affine maps over map-side polynomial term hashes
  * (the codegen `termhash`); no floating point anywhere, and no
  * corpus-wide vocabulary structure in any signature path (r9 verdict
  * item 5: a dense term dictionary needs a global ordering, which at
  * 10^8–10^9-term vocabularies is a guaranteed straggler — hashed term
  * ids are embarrassingly parallel and collision-bounded by the
  * modulus, which is what MinHash assumes of its permutations anyway).
  */
object TextDedup {

  /** Default affine minhash coefficients (k=8) — the pack's constants. */
  val DefaultCoeffs: Seq[(Long, Long)] =
    Seq(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)
      .zip(Seq(3L, 5L, 7L, 11L, 13L, 17L, 19L, 23L))

  /** Default minhash modulus: 2^31 − 1 (Mersenne prime). The r=2 band
    * space is P² ≈ 4.6e18 (fits int64 exactly because band = m·P + m'
    * < P² < 2^63), so CHANCE band collisions between unrelated
    * documents — the quadratic spurious-candidate term every LSH
    * self-join pays, measured at ratio 15.7 on 10× data under the
    * earlier 10007 modulus whose band space was only ~10^8 — are
    * ~n²/2P² per band: negligible at any corpus size that fits on a
    * cluster. */
  val DefaultPrime: Long = 2147483647L

  /** Distinct (doc_id, term) token-SET relation from a raw text
    * column (whitespace tokenization, lower-cased, empties dropped).
    * Output: (doc_id, term). */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .distinct()

  /** Term frequencies (doc_id, term, tf) — simhash's weighted input. */
  def termFreqs(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Deterministic dense dictionary over any frame with a `term`
    * column: term → 1-based `tid`, ordered by term — for callers that
    * genuinely need DENSE ids (embedding matrices, array indexing).
    * Distributed id assignment (r9 verdict item 5): range-repartition
    * by term + sort-within-partitions gives globally ordered
    * partitions, and `zipWithIndex` assigns dense offsets per
    * partition — the whole vocabulary never flows through one task
    * the way a `row_number()` over an unpartitioned window does.
    * (The signature paths below deliberately do NOT use this: hashed
    * term ids need no vocabulary pass at all.)
    * Output: (term, tid). */
  def dictionary(terms: DataFrame): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val sorted = terms.select(col("term")).distinct()
      .repartitionByRange(col("term"))
      .sortWithinPartitions(col("term"))
    sorted.as[String].rdd.zipWithIndex()
      .map { case (t, i) => (t, i + 1L) }
      .toDF("term", "tid")
  }

  /** k affine-permutation minhash signatures (m1..mk) plus banded LSH
    * join keys (band1..band_{k/bandRows}) per document. `tok` is a
    * (doc_id, term) relation; term ids come from the codegen
    * `termhash` polynomial fold mod `prime` — computed MAP-SIDE per
    * token, so the only shuffle in the whole signature build is the
    * per-doc groupBy (no vocabulary distinct, no dictionary join, no
    * global ordering anywhere; the r8 dense-dictionary form cost a
    * corpus-wide distinct + an unpartitioned window that single-tasks
    * a 100-TB vocabulary). Candidate generation downstream is a band
    * equi-join: documents sharing ANY band key are near-dup
    * candidates — bucketed, never all-pairs.
    * Output: (doc_id, m1..mk, band1..). */
  def minhashSignatures(tok: DataFrame,
      coeffs: Seq[(Long, Long)] = DefaultCoeffs,
      prime: Long = DefaultPrime, bandRows: Int = 2,
      multiplier: Long = 131L): DataFrame = {
    require(coeffs.nonEmpty && coeffs.length % bandRows == 0,
      s"coeffs (${coeffs.length}) must be a multiple of bandRows ($bandRows)")
    require(coeffs.forall { case (a, b) =>
        a > 0 && b >= 0 && b < prime && a < Long.MaxValue / prime },
      s"minhash coefficients overflow int64 under prime=$prime " +
        "(need a < Long.MaxValue/prime and b < prime)")
    // termhash's polynomial fold computes h*multiplier + codepoint with
    // h < prime and codepoints <= 0x10FFFF; the same loud-guard
    // discipline applies to ITS operands (r10 advice: a caller-supplied
    // large multiplier or prime silently wraps inside the codegen hash).
    require(multiplier > 0 &&
        multiplier < (Long.MaxValue - 0x10FFFFL) / prime,
      s"termhash fold overflows int64: multiplier=$multiplier prime=$prime")
    // The band key is a base-`prime` positional fold of its bandRows
    // minhashes, so it needs prime^bandRows <= int64 — with the wide
    // default prime that bounds bandRows at 2; silent wraparound here
    // would alias unrelated buckets (loud-guard discipline, §7.4).
    require(BigInt(prime).pow(bandRows) <= BigInt(Long.MaxValue),
      s"band fold overflows int64: prime=$prime bandRows=$bandRows")
    graft.functions.TermHash.register(tok.sparkSession)
    val mins = coeffs.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("tid") * a + b, lit(prime))).as(s"m${i + 1}")
    }
    val sigs = tok
      .withColumn("tid", expr(s"termhash(term, ${multiplier}L, ${prime}L)"))
      .groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bands = (0 until coeffs.length / bandRows).map { bi =>
      (0 until bandRows).map(r => col(s"m${bi * bandRows + r + 1}"))
        .reduce((acc, m) => acc * prime + m).as(s"band${bi + 1}")
    }
    sigs.select(col("doc_id") +:
      coeffs.indices.map(i => col(s"m${i + 1}")) ++: bands: _*)
  }

  /** LSH candidate pairs + agreement verify over a
    * `minhashSignatures` output: documents sharing ANY band bucket
    * become candidates via per-band equi-joins on (band index, band
    * value) — bucketed, never all-pairs — then each candidate pair's
    * estimated Jaccard is the fraction of its k minhashes that agree
    * (the standard unbiased MinHash estimator); pairs with
    * `n_agree >= minAgree` survive. FUSED verify (r10 ScaleBench
    * adjudication): the k minhashes ride through the band join — k
    * extra longs per banded row — so the candidate stream is scored
    * and gated IN the join output and never rejoins the signature
    * relation; the multi-band dedup (`distinct`) runs AFTER the
    * agreement gate, on the smallest relation in the plan. The
    * unfused form (distinct over raw candidates, then two doc_id
    * joins back to `sigs`) measured 16× on 10× data; this form is
    * ~linear. Callers running repeatedly should still cache `sigs`
    * (the keyed query does, via SessionCache).
    *
    * HOT-BUCKET GUARD (r10 verdict item 1): the band self-join is
    * per-bucket quadratic — a degenerate bucket (mass-duplicated
    * boilerplate whose band collides, e.g. the sf0.1 fixture's
    * 3847-doc bucket → 7.4M candidate rows from ONE key) enumerates
    * |bucket|² pairs before the agreement gate can drop any. Buckets
    * with occupancy > `bucketCap` therefore skip pair enumeration and
    * emit a CANONICAL STAR instead: every member pairs only with the
    * bucket's min-doc_id row (|bucket|−1 edges, linear). Oversized
    * buckets are exact-dup-grade clusters (the members collided on a
    * full band of minhashes), so the star edges still pass the
    * agreement gate and downstream connected components
    * (DedupCluster) recover the full cluster — the recall loss is
    * only member–member edges WITHIN a capped bucket that no other
    * (small) band bucket witnesses, i.e. pairs that were only ever
    * reachable through the degenerate key. Both branches are scored
    * by the same fused k-minhash agreement; per-bucket occupancy and
    * the canonical row (lexicographic struct min — doc_id leads, so
    * it is the min-doc_id member WITH its signatures, no second join)
    * come from one hash aggregate whose (bi, bv) shuffle the join
    * reuses.
    * Output: (da, db, n_agree) with da < db. */
  def minhashPairs(sigs: DataFrame, k: Int = 8, bands: Int = 4,
      minAgree: Int = 4, bucketCap: Int = 256): DataFrame =
    minhashPairsOnBanded(minhashBanded(sigs, k, bands), k,
      minAgree, bucketCap)

  /** The banded LSH index relation — the artifact stage of
    * `minhashPairs`, split out (r15) so callers can PERSIST it (a
    * written (bi, bv)-bucketed table makes the pair self-join
    * exchange-free; see dedup_minhash_pairs_bucketed). One row per
    * (doc, band): (bi, bv, doc_id, m1..mk, bucket_n, canon) — the
    * banded signature plus its bucket's occupancy and canonical
    * (lexicographic-min) member, from one hash aggregate whose
    * (bi, bv) shuffle the downstream join reuses. */
  def minhashBanded(sigs: DataFrame, k: Int = 8,
      bands: Int = 4): DataFrame = {
    require(k >= 1 && bands >= 1, s"bad minhashBanded: k=$k bands=$bands")
    val names = ("doc_id" +: (1 to k).map(i => s"m$i")) ++ Seq("bi", "bv")
    val b = sigs.select(col("doc_id") +: (1 to k).map(i => col(s"m$i")) :+
        posexplode(array((1 to bands).map(i => col(s"band$i")): _*)): _*)
      .toDF(names: _*)
    val occ = b.groupBy(col("bi"), col("bv")).agg(
      count(lit(1)).as("bucket_n"),
      min(struct(col("doc_id") +: (1 to k).map(i => col(s"m$i")): _*))
        .as("canon"))
    b.join(occ, Seq("bi", "bv"))
  }

  /** Pair enumeration + agreement gate over a `minhashBanded`
    * relation (see `minhashPairs` for the full semantics). Both
    * self-join sides come from the SAME input relation, so when
    * `banded` is a (bi, bv)-bucketed written table the join subtree
    * is scan → SMJ with zero exchange. */
  def minhashPairsOnBanded(banded: DataFrame, k: Int = 8,
      minAgree: Int = 4, bucketCap: Int = 256): DataFrame = {
    require(k >= 1 && minAgree >= 0 && bucketCap >= 1,
      s"bad minhashPairsOnBanded params: k=$k minAgree=$minAgree " +
        s"bucketCap=$bucketCap")
    val bo = banded
    val small = bo.filter(col("bucket_n") <= bucketCap)
    val ba = small.select(col("bi") +: col("bv") +: col("doc_id").as("da") +:
      (1 to k).map(i => col(s"m$i").as(s"xa$i")): _*)
    val bb = small.select(col("bi") +: col("bv") +: col("doc_id").as("db") +:
      (1 to k).map(i => col(s"m$i").as(s"xb$i")): _*)
    val smallPairs = ba.join(bb, Seq("bi", "bv"))
      .filter(col("da") < col("db"))
      .select(col("da") +: (1 to k).map(i => col(s"xa$i")) ++:
        col("db") +: (1 to k).map(i => col(s"xb$i")): _*)
    // canon.doc_id is the bucket minimum, so doc_id > canon.doc_id for
    // every non-canonical member — da < db by construction.
    val bigPairs = bo.filter(col("bucket_n") > bucketCap)
      .filter(col("doc_id") =!= col("canon.doc_id"))
      .select(col("canon.doc_id").as("da") +:
        (1 to k).map(i => col(s"canon.m$i").as(s"xa$i")) ++:
        col("doc_id").as("db") +:
        (1 to k).map(i => col(s"m$i").as(s"xb$i")): _*)
    smallPairs.unionByName(bigPairs)
      .withColumn("n_agree",
        (1 to k).map(i => when(col(s"xa$i") === col(s"xb$i"), 1L)
          .otherwise(0L)).reduce(_ + _))
      .filter(col("n_agree") >= minAgree)
      .select(col("da"), col("db"), col("n_agree"))
      .distinct()
  }

  /** End-to-end near-dup REMOVAL — the one-call form of the whole
    * pipeline (tokens → signatures → capped LSH pairs → connected
    * components → keep canonicals): returns the SURVIVING rows of
    * `docs`, all input columns preserved. A doc survives iff it is
    * its near-dup cluster's min-id canonical or belongs to no
    * cluster. Clustering runs min-label propagation to its unique
    * fixpoint (operators.DedupCluster.components — per-round bounded
    * equi-join + min-agg, lineage-truncated), so the result is
    * deterministic regardless of execution order; cluster membership
    * is provably invariant under the hot-bucket star reroute
    * (PropertyLawsSpec). Callers deduping repeatedly should cache
    * the pair relation themselves; the keyed `pipeline_neardup`
    * summary is this operation's oracled twin. */
  def dedupCorpus(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, bands: Int = 4, minAgree: Int = 4,
      bucketCap: Int = 256): DataFrame = {
    val pairs = minhashPairs(
      minhashSignatures(tokens(docs, idCol, textCol)),
      k = k, bands = bands, minAgree = minAgree, bucketCap = bucketCap)
    val dropped = graft.operators.DedupCluster
      .components(pairs.select(col("da"), col("db")))
      .filter(col("doc_id") =!= col("comp"))
      .select(col("doc_id").as(idCol))
    docs.join(dropped, Seq(idCol), "left_anti")
  }

  /** 16-bit tf-weighted SimHash per document from a (doc_id, term,
    * tf) relation — one corpus shuffle (the groupBy), per-bit vote
    * sums inside a single aggregate, codegen `termhash` char fold.
    * Output: (doc_id, simhash). */
  def simhash16(tf: DataFrame, multiplier: Long = 131L,
      modulus: Long = 65536L): DataFrame = {
    graft.functions.TermHash.register(tf.sparkSession)
    val h = tf.withColumn("h",
      expr(s"termhash(term, ${multiplier}L, ${modulus}L)"))
    val voteSums = (0 until 16).map { j =>
      sum(when(expr(s"(h div ${1L << j}) % 2") === 1, col("tf"))
        .otherwise(-col("tf"))).as(s"sw$j")
    }
    h.groupBy(col("doc_id")).agg(voteSums.head, voteSums.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(j =>
          when(col(s"sw$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Hamming-ball near-dup candidate pairs over (doc_id, simhash)
    * signatures: block by the top byte (differing top bytes already
    * imply distance ≥ 1 there), exact bit_count(xor) ≤ maxDist within
    * blocks — the self-join key is the 8-bit block, never all-pairs.
    * Output: (da, db, hdist) with da < db. */
  def hammingCandidates(sigs: DataFrame, maxDist: Int = 3): DataFrame = {
    val s = sigs.withColumn("blk", expr("simhash div 256"))
    val a = s.select(col("blk"), col("doc_id").as("da"),
      col("simhash").as("sa"))
    val b = s.select(col("blk"), col("doc_id").as("db"),
      col("simhash").as("sb"))
    a.join(b, Seq("blk")).filter(col("da") < col("db"))
      .withColumn("hdist", expr("CAST(bit_count(sa ^ sb) AS BIGINT)"))
      .filter(col("hdist") <= maxDist)
      .select(col("da"), col("db"), col("hdist"))
  }

  /** Manku-blocked Hamming dedup (WWW'07) over ANY (id, hash)
    * signature relation — the generalized form behind `mm_dedup` and
    * usable over simhash64 or any ≤63-bit fingerprint. The hash is
    * split into `blocks` contiguous equal-width blocks; a pair within
    * Hamming distance ≤ maxDist must agree on ≥1 block whenever
    * maxDist < blocks (pigeonhole — the blocked candidate set is
    * provably COMPLETE, not a recall trade), so candidates come from
    * per-block equi-joins, never all-pairs. Pairs then gate on the
    * exact popcount distance and resolve to min-label components.
    * Output: one row per input id — (idCol, comp, keep), `keep` true
    * for each component's canonical minimum id and every singleton.
    * Ids must be numeric (DedupCluster.components' contract).
    *
    * Block-occupancy bound (r13 adjudication): expected docs per
    * block bucket is N / 2^(bits/blocks), so candidate volume stays
    * near-linear while N ≲ 2^(bits/blocks) · O(1) — with 64/4 = 16-bit
    * blocks that is a few million docs per partition-disjoint corpus
    * shard. Past that, production Manku (WWW'07 §3) widens the
    * effective key: sort each permuted table and probe a PREFIX RANGE
    * (block + next bits) instead of a pure equi-key, keeping bucket
    * occupancy O(1) as N grows. The equi-join form here is the
    * shuffle-friendly first rung of that ladder.
    *
    * Hash-entropy collapse (r16, the mm_dedup cure — r15 verdict
    * item 2): when the input's hash space collapses (the 100x staged
    * text proxy mapped 499,913 docs onto 13,721 distinct ahash
    * values), every occupancy bound above is void — one block bucket
    * held 138,625 DOCS → 30.2e9 candidate pairs. Two structural
    * guards, applied in order:
    *
    * 1. DISTINCT-HASH COLLAPSE (exact — zero recall loss): identical
    *    hashes are distance-0 duplicates by definition, so the block
    *    join runs over ONE representative per distinct hash value
    *    (the min id; one groupBy on the hash). Docs sharing a hash
    *    rejoin their representative's component afterwards, and
    *    because each representative is the min id of its hash group,
    *    the component's min representative IS the component's min doc
    *    id — labels are bit-identical to the uncollapsed form.
    *    Candidate volume now scales with the DISTINCT-hash count:
    *    the collapsed 100x proxy is 13.7k representatives, not 500k
    *    docs.
    *
    * 2. HOT-BUCKET CANONICAL STAR over representatives (ported from
    *    minhashPairsOnBanded's r11 treatment; `bucketCap`): a block
    *    bucket with more than `bucketCap` DISTINCT hashes skips pair
    *    enumeration and emits |bucket|−1 star edges to the bucket's
    *    min-rid member, each still gated by the exact popcount
    *    distance. Unlike the minhash case a hot hamming bucket is
    *    NOT exact-dup-grade (members agree on one w-bit block, not
    *    the whole hash), so the star is a declared recall trade:
    *    member–member pairs within a capped bucket survive only if
    *    both ends sit within `maxDist` of the canonical (or share
    *    another, small, block bucket). The cap only engages past
    *    bucketCap · 2^w distinct hashes per shard — beyond the
    *    equi-join rung's design point — and caps the per-bucket edge
    *    count at linear instead of quadratic. */
  def hammingDedup(sigs: DataFrame, idCol: String = "doc_id",
      hashCol: String = "hash", bits: Int = 64, blocks: Int = 4,
      maxDist: Int = 3, bucketCap: Int = 256): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63]: $bits")
    require(blocks >= 1 && bits % blocks == 0,
      s"blocks ($blocks) must divide bits ($bits) evenly")
    require(maxDist < blocks,
      s"completeness needs maxDist ($maxDist) < blocks ($blocks): " +
        "pigeonhole no longer guarantees a shared block otherwise")
    require(bucketCap >= 1, s"bucketCap must be >= 1: $bucketCap")
    val w = bits / blocks
    val s = sigs.select(col(idCol).as("hid"), col(hashCol).as("hh"))
    // Guard 1: one representative (min id) per distinct hash value.
    val reps = s.groupBy(col("hh")).agg(min(col("hid")).as("rid"))
    val blocked = reps.select(col("rid"), col("hh"),
      posexplode(array((0 until blocks).map(k =>
        expr(s"(hh div ${1L << (w * k)}L) % ${1L << w}L")): _*)))
      .toDF("rid", "hh", "k", "blk")
    // Bucket occupancy + canonical member from one hash aggregate
    // whose (k, blk) shuffle the candidate join reuses; rid is unique
    // per representative, so the struct min is the min-rid member
    // WITH its hash (no second join).
    val occ = blocked.groupBy(col("k"), col("blk")).agg(
      count(lit(1)).as("bucket_n"),
      min(struct(col("rid"), col("hh"))).as("canon"))
    val bo = blocked.join(occ, Seq("k", "blk"))
    val small = bo.filter(col("bucket_n") <= bucketCap)
    val a = small.select(col("k"), col("blk"), col("rid").as("da"),
                         col("hh").as("ha"))
    val b = small.select(col("k"), col("blk"), col("rid").as("db"),
                         col("hh").as("hb"))
    val smallPairs = a.join(b, Seq("k", "blk"))
      .filter(col("da") < col("db"))
      .filter(expr("bit_count(ha ^ hb)") <= maxDist)
      .select(col("da"), col("db"))
    // Guard 2: canonical star — canon.rid is the bucket minimum, so
    // da < db by construction; the exact distance gate still applies.
    val bigPairs = bo.filter(col("bucket_n") > bucketCap)
      .filter(col("rid") =!= col("canon.rid"))
      .filter(expr("bit_count(canon.hh ^ hh)") <= maxDist)
      .select(col("canon.rid").as("da"), col("rid").as("db"))
    val pairs = smallPairs.unionByName(bigPairs).distinct()
    val comps = graft.operators.DedupCluster.components(pairs)
      .select(col("doc_id").as("rid"), col("comp"))
    s.join(reps, Seq("hh"))
      .join(comps, Seq("rid"), "left")
      .withColumn("comp", coalesce(col("comp"), col("rid")))
      .withColumn("keep", col("hid") === col("comp"))
      .select(col("hid").as(idCol), col("comp"), col("keep"))
  }
}
