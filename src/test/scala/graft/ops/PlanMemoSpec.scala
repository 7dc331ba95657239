package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** PlanMemo lifecycle contract: dead-session entries are purged on the next
  * access (stopped-context detection via the injectable predicate), and the
  * LRU bound with blocking unpersist IS the contract for abandoned-but-
  * unstopped sessions on a shared live context.
  */
class PlanMemoSpec extends SparkSpec {

  private def frame(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).toDF("v")
  }

  test("get memoizes per key and persists the frame") {
    val memo = new PlanMemo(maxEntries = 4)
    var builds = 0
    def build() = { builds += 1; frame(3) }
    val a = memo.get("k1")(build())
    val b = memo.get("k1")(build())
    assert(builds === 1)
    assert(a eq b)
    assert(a.storageLevel === StorageLevel.MEMORY_AND_DISK)
    memo.clear()
    assert(memo.size === 0)
  }

  test("LRU bound: eviction past maxEntries unpersists the eldest") {
    val memo = new PlanMemo(maxEntries = 2)
    val a = memo.get("a")(frame(1))
    memo.get("b")(frame(2))
    memo.get("c")(frame(3)) // evicts "a" (eldest by access)
    assert(memo.size === 2)
    assert(a.storageLevel === StorageLevel.NONE, "evicted entry must unpersist")
    var rebuilt = false
    memo.get("a") { rebuilt = true; frame(1) }
    assert(rebuilt, "evicted key rebuilds")
    memo.clear()
  }

  test("dead-session purge: entries whose session died vanish on next access") {
    // the shared test context must stay up, so simulate death with the
    // injectable predicate — the default is sparkContext.isStopped, which
    // flips for every entry of a stopped session at once
    val dead = new java.util.concurrent.atomic.AtomicBoolean(false)
    val memo = new PlanMemo(maxEntries = 8, isDead = _ => dead.get())
    val a = memo.get("a")(frame(1))
    memo.get("b")(frame(2))
    assert(memo.size === 2)
    dead.set(true) // "session stopped"
    val memo2Probe = memo.get("c") { dead.set(false); frame(3) }
    // the two dead entries were swept before "c" was admitted
    assert(memo.size === 1)
    assert(a.storageLevel === StorageLevel.NONE, "swept entry must unpersist")
    assert(memo2Probe.storageLevel === StorageLevel.MEMORY_AND_DISK)
    memo.clear()
  }

  test("default predicate is stopped-context detection (live context => kept)") {
    val memo = new PlanMemo(maxEntries = 4) // default isDead
    memo.get("a")(frame(1))
    memo.get("b")(frame(2))
    assert(memo.size === 2, "live-context entries survive the sweep")
    memo.clear()
  }
}
