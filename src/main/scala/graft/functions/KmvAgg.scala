package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV sketch buffer: the k lexically-smallest DISTINCT md5 hex hashes
  * seen so far (fixed-width lowercase hex ⇒ lexical order == numeric
  * order of the hash value). Bounded at k elements — constant-size
  * state per group no matter how many rows flow through, which is what
  * makes it usable as STREAMING aggregation state (st14).
  */
case class KmvBuf(hashes: Seq[String])

/** 2.J UDAF surface, sketch edition (r7): a mergeable k-minimum-values
  * distinct sketch as a typed Aggregator. Insert = keep k smallest
  * distinct; merge = union then re-take-k — associative, commutative
  * and idempotent (duplicate hashes collapse), so partial aggregation,
  * shuffle-side merge, and streaming micro-batch updates all reach the
  * IDENTICAL final state as one sequential pass. That determinism is
  * the point: unlike the HLL Aggregator path, this sketch's state is
  * engine-independent, so the streaming twin (st14) is asserted
  * bit-equal to the DuckDB-oracled batch `sketch_kmv` result.
  *
  * O(k) per update via a single merge-insert pass (k = 32 here); the
  * buffer is always sorted ascending.
  */
class KmvAgg(k: Int) extends Aggregator[String, KmvBuf, Seq[String]] {

  def zero: KmvBuf = KmvBuf(Vector.empty)

  def reduce(b: KmvBuf, h: String): KmvBuf =
    if (h == null) b
    else if (b.hashes.length == k && h >= b.hashes.last) b // fast reject
    else if (b.hashes.contains(h)) b
    else KmvBuf(((b.hashes :+ h).sorted).take(k))

  def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf =
    KmvBuf((b1.hashes ++ b2.hashes).distinct.sorted.take(k))

  def finish(b: KmvBuf): Seq[String] = b.hashes

  def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
