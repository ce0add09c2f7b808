package graft

import org.apache.spark.sql.DataFrame

/** Per-round lineage truncation for driver-iterated fixpoint loops
  * (DedupCluster.components, Graph.bfsDistances, Graph.kcore): without
  * it the plan tree re-derives round i-1 every round, so work grows
  * exponentially in the round count. Defaults to `localCheckpoint`
  * (executor-local blocks — right for local mode and short loops, but
  * on a real cluster a lost executor after round k can no longer
  * replay the truncated lineage). Set
  * `spark.graft.reliableCheckpoint=true` (legacy per-op alias
  * `spark.graft.dedup.reliableCheckpoint` still honored) with
  * `sparkContext.setCheckpointDir` pointing at HDFS/object storage to
  * write reliable checkpoints instead — slower per round, but one
  * dead executor costs a task retry, not the job. One config governs
  * ALL the iterative loops (r11 ADVICE: Graph's loops hard-coded
  * localCheckpoint while components was configurable — inconsistent
  * resilience for equally long fixpoints). */
object Fixpoint {
  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable = Seq("spark.graft.reliableCheckpoint",
        "spark.graft.dedup.reliableCheckpoint")
      .exists(k => spark.conf.getOption(k).exists { v =>
        // r12 ADVICE: name the config key instead of a bare
        // IllegalArgumentException from String.toBoolean on '1'/'yes'.
        if (v.equalsIgnoreCase("true")) true
        else if (v.equalsIgnoreCase("false")) false
        else throw new IllegalArgumentException(
          s"$k must be 'true' or 'false', got '$v'")
      })
    if (reliable && spark.sparkContext.getCheckpointDir.isEmpty)
      throw new IllegalStateException(
        "spark.graft.reliableCheckpoint=true requires " +
          "sparkContext.setCheckpointDir (an HDFS/object-store path)")
    if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
  }
}

/** Small shared utilities (one definition — several callers). */
object Util {

  /** Recursive directory delete, safe on missing paths and races. */
  def deleteRecursively(f: java.io.File): Unit = if (f.exists()) {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
  }

  /** Metastore-safe table tag for a data dir (r13 ADVICE discipline,
    * promoted r15 from graph_jaccard_bucketed to all written-index
    * keys): sanitized basename PLUS a full-path hash, so two dirs
    * whose basenames sanitize identically ('sf0.01' vs 'sf0_01')
    * cannot collide on the table name — the second staging would
    * silently rewrite the table the first dir's still-cached query
    * reads. r16 (ADVICE): the hash is the first 12 hex chars of
    * SHA-256 of the full path, not String.hashCode — a 32-bit hash
    * collision between two live dirs would silently rewrite the
    * other dir's table, the exact hazard this helper exists to
    * prevent; 48 bits of a cryptographic digest makes that
    * practically impossible.
    *
    * Single-writer assumption (r17 ADVICE): the tag is scoped by DATA
    * DIR, not by session — every written-index key that builds
    * `<name>_<dirTag>` (DROP + overwrite under a SessionCache memo)
    * assumes at most one JVM materializes indexes for a given dir at
    * a time. Two concurrent sessions pointed at the SAME dir would
    * clobber each other's index mid-read. That is the right trade for
    * this library's shape — the index IS the shared offline artifact,
    * so concurrent readers must see one canonical build, and the
    * test/verify drivers are single-writer per dir by construction.
    * A session-scoped tag would instead rebuild (and duplicate) the
    * index per session, defeating the build-once-read-many design. */
  def dirTag(dir: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(dir.getBytes("UTF-8"))
    new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + digest.take(6).map(b => f"${b & 0xff}%02x").mkString
  }
}
