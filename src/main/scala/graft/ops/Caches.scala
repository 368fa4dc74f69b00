package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry of cached intermediate frames created inside library
  * pipelines (Dedup's shingle/signature scans, Ann's band tables,
  * Contamination's held-out shingles). The frames are module-internal —
  * callers never see them, so without a registry they could never be
  * unpersisted in a long-lived session.
  *
  * References are WEAK: a DataFrame the caller's query graph no longer
  * reaches is collectable (Spark's session-scoped CacheManager keeps the
  * cached PLAN and its executor blocks alive independently, bounded by
  * MEMORY_AND_DISK LRU eviction), so the registry itself never grows the
  * driver heap without bound. [[unpersistAll]] releases whatever is
  * still reachable — call it between batches, not mid-query: an
  * unexecuted query built before the call recomputes (not re-caches) its
  * shared subtrees when it runs.
  */
object Caches {

  private val registry =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[DataFrame, java.lang.Boolean]())

  private[graft] def tracked(df: DataFrame): DataFrame = {
    registry.put(df, java.lang.Boolean.TRUE); df
  }

  /** Unpersist every still-reachable tracked frame (non-blocking). */
  def unpersistAll(): Unit = registry.synchronized {
    val it = registry.keySet().iterator()
    while (it.hasNext) {
      val df = it.next()
      if (df != null) {
        try df.unpersist(false)
        catch { case _: Exception => () } // session may already be stopped
      }
      it.remove()
    }
  }
}
