package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Bounded in-session memo for expensive STAGE DataFrames (the pair table,
  * the window-posting table): compute once per key, persist MEMORY_AND_DISK,
  * LRU-evict (with unpersist) past `maxEntries`, and expose an explicit
  * release/clear lifecycle so long-lived library sessions never pin blocks
  * forever. At 100 TB the same seam is a materialized Parquet table; this
  * mirrors that layout for in-session reuse.
  *
  * Keys should embed the CANONICALIZED PLAN OBJECT of the source frame
  * (structural equality covers LocalRelation data, which plan strings
  * elide) plus every parameter that changes the stage's content.
  *
  * An entry whose cached blocks were evicted externally (executor pressure,
  * `spark.catalog.clearCache()`) degrades gracefully: the lineage recomputes
  * and [[get]] re-marks it for caching on next access.
  */
private[graft] final class PlanMemo(
    maxEntries: Int = 32,
    // injectable for specs; the default spots entries whose blocks died
    // with their stopped SparkContext
    isDead: DataFrame => Boolean = _.sparkSession.sparkContext.isStopped) {

  private val map =
    new java.util.LinkedHashMap[AnyRef, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, DataFrame]): Boolean =
        if (size() > maxEntries) { e.getValue.unpersist(false); true }
        else false
    }

  /** The memoized frame for `key`, building (and persisting) on first use.
    *
    * Session hygiene: entries whose backing SparkContext has STOPPED are
    * purged here before every lookup (their blocks died with the context;
    * keeping the map entry would pin dead plan trees on the heap of a
    * long-lived JVM that hosts many short-lived sessions). Entries of
    * ABANDONED-but-unstopped sessions on a live shared context cannot be
    * detected; for those the LRU bound (`maxEntries`, blocking unpersist
    * on eviction) IS the contract — spec-pinned in PlanMemoSpec.
    */
  def get(key: AnyRef)(build: => DataFrame): DataFrame = {
    val df = map.synchronized {
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (isDead(e.getValue)) {
          // unpersist is best-effort: a stopped context's blocks are gone
          try e.getValue.unpersist(false)
          catch { case scala.util.control.NonFatal(_) => () }
          it.remove()
        }
      }
      map.computeIfAbsent(key, _ => build)
    }
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    df
  }

  /** Drop `key`'s entry and unpersist its blocks (blocking, so callers can
    * assert nothing survives). Returns whether an entry existed.
    */
  def release(key: AnyRef): Boolean = {
    val removed = map.synchronized(Option(map.remove(key)))
    removed.foreach(_.unpersist(true))
    removed.isDefined
  }

  /** Live entry count (specs). */
  def size: Int = map.synchronized(map.size())

  /** Drop EVERY entry and unpersist their blocks. */
  def clear(): Unit = {
    val all = map.synchronized {
      val vs = new java.util.ArrayList(map.values())
      map.clear()
      vs
    }
    all.forEach(_.unpersist(true))
  }
}
