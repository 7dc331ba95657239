package graft.ann

import org.scalatest.funsuite.AnyFunSuite

/** Adversarial sweep over the routed sub-sharding spread (r17 verdict ask
  * #6): the production bound is the LOUD 8× fail inside the build task —
  * this spec establishes that for the id distributions a real pipeline
  * actually produces (consecutive blocks, strided, low-entropy), the
  * splitmix64 spread stays near-uniform, so the 8× backstop is a
  * tripwire, not a load-bearing balancer. Pure driver-side arithmetic
  * (no SparkSession — [[Ann.routedSubOf]] is deterministic math).
  */
class RoutedSubShardSpreadSpec extends AnyFunSuite {

  /** max/expected occupancy over `factor` sub-shards for an id stream. */
  private def maxSkew(ids: Iterator[Long], factor: Int): Double = {
    val counts = new Array[Long](factor)
    var n = 0L
    ids.foreach { id => counts(Ann.routedSubOf(id, factor)) += 1; n += 1 }
    counts.max.toDouble / (n.toDouble / factor)
  }

  // 80k ids per shape, factor 8: expected 10k per sub-shard; binomial
  // fluctuation is ~1% so 1.10 is a generous-but-meaningful bound, far
  // under the 8x production backstop
  private val Factor = 8
  private val N = 80000

  test("consecutive id blocks (planted duplicate classes) spread evenly") {
    assert(maxSkew((0L until N.toLong).iterator, Factor) <= 1.10)
  }

  test("strided ids (2^20 stride - the routedShardKey layout quantum) spread evenly") {
    assert(maxSkew((0 until N).iterator.map(i => i.toLong << 20), Factor) <= 1.10)
  }

  test("even-only ids (low-bit-degenerate) spread evenly") {
    assert(maxSkew((0 until N).iterator.map(i => i.toLong * 2), Factor) <= 1.10)
  }

  test("high-bit-only ids spread evenly") {
    assert(maxSkew((0 until N).iterator.map(i => i.toLong << 44), Factor) <= 1.10)
  }

  test("negative ids land in valid sub-shards and spread evenly") {
    val ids = (0 until N).iterator.map(i => -1L - i * 3L)
    val counts = new Array[Long](Factor)
    ids.foreach { id =>
      val s = Ann.routedSubOf(id, Factor)
      assert(s >= 0 && s < Factor)
      counts(s) += 1
    }
    assert(counts.max.toDouble / (N.toDouble / Factor) <= 1.10)
  }

  test("congruent residue classes (id % factor constant pre-mix) spread evenly") {
    // every id ≡ 3 (mod 8): without the mix these would all land in one
    // residue — the exact failure the spread exists to prevent
    assert(maxSkew((0 until N).iterator.map(i => i.toLong * 8 + 3), Factor) <= 1.10)
  }

  test("sub-factor rule: exact bound arithmetic and the 2^20 key-layout fail") {
    assert(Ann.routedSubFactorOf(1, 64) == 1)
    assert(Ann.routedSubFactorOf(64, 64) == 1)
    assert(Ann.routedSubFactorOf(65, 64) == 2)
    assert(Ann.routedSubFactorOf((1L << 20) * 64 - 64, 64) == (1 << 20) - 1)
    val e = intercept[IllegalArgumentException] {
      Ann.routedSubFactorOf((1L << 20) * 64, 64)
    }
    assert(e.getMessage.contains("2^20"))
  }

  test("the adversary that CAN defeat the spread is named: ids equal after mix64 truncation are out of scope") {
    // splitmix64 is a bijection, so only REPEATED ids can collide into
    // one sub-shard. Duplicate ids violate the corpus's primary-key
    // contract upstream (every gate table has unique ids); the 8x
    // in-task fail is the backstop if a caller feeds them anyway.
    val sames = Iterator.fill(1000)(42L)
    val counts = new Array[Long](Factor)
    sames.foreach { id => counts(Ann.routedSubOf(id, Factor)) += 1 }
    assert(counts.max == 1000L) // all in one sub-shard, by construction
  }
}
