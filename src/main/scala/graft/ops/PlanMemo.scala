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
private[graft] final class PlanMemo(maxEntries: Int = 32) {

  private val map =
    new java.util.LinkedHashMap[AnyRef, DataFrame](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[AnyRef, DataFrame]): Boolean =
        if (size() > maxEntries) { e.getValue.unpersist(false); true }
        else false
    }

  /** The memoized frame for `key`, building (and persisting) on first use. */
  def get(key: AnyRef)(build: => DataFrame): DataFrame = {
    val df = map.synchronized(map.computeIfAbsent(key, _ => build))
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
