package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo for shared "index" relations (SURVEY.md §2.K):
  * duplicate-cluster components, SimHash signature indexes, IVF
  * codebooks. These are build-once-probe-many artifacts — several query
  * keys (and several bench repetitions) consume the same relation, and
  * recomputing a 25-round label-propagation loop per consumer is pure
  * waste (measured: 3 consumers × ~3 s at sf0.1, r6 regression).
  *
  * Design:
  * - Keyed by (applicationId, logical key). Persisted storage lives at
  *   the SparkContext level, so the context's applicationId is the
  *   right scope — two sessions over one context share the underlying
  *   cache blocks anyway.
  * - `persist = true` entries are pinned MEMORY_AND_DISK (never
  *   recomputed-on-eviction-pressure semantics of MEMORY_ONLY; these
  *   relations are narrow — signatures, labels, codebooks — so the
  *   disk fallback is cheap insurance, and at cluster scale the
  *   equivalent artifact would be written to a table).
  * - `clear(spark)` unpersists and forgets every entry of the live
  *   context: the explicit lifecycle hook Bench/Verify call before
  *   session stop, so long benchmark sessions never accumulate
  *   unreleased cache entries (r6 advice: persist-without-unpersist).
  *
  * At 100 TB the pattern is unchanged, only the storage level moves:
  * the index build writes a parquet/Delta table once and consumers
  * scan it — the memoization boundary (one build, many probes) is the
  * part that matters, not the local cache.
  */
object SessionCache {

  private val entries =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  private def scope(s: SparkSession): String = s.sparkContext.applicationId

  /** Memoize `build` under `key` for the session's context. When
    * `persist` is true the result is cached MEMORY_AND_DISK; pass
    * false for relations that are already materialized (e.g. a
    * localCheckpoint'd iterative fixpoint — its blocks are storage
    * already, a second persist would just double-track them).
    */
  def cached(s: SparkSession, key: String, persist: Boolean = true)(
      build: => DataFrame): DataFrame =
    entries.getOrElseUpdate((scope(s), key), {
      val df = build
      if (persist) df.persist(StorageLevel.MEMORY_AND_DISK) else df
    })

  /** Unpersist and forget every entry belonging to `s`'s context.
    * Call before session stop (Bench/Verify do). Blocking=false: block
    * release can proceed async, the session is shutting down anyway.
    */
  def clear(s: SparkSession): Unit = {
    val sid = scope(s)
    entries.keys.filter(_._1 == sid).foreach { k =>
      entries.remove(k).foreach { df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () } // context may already be down
      }
    }
  }
}
