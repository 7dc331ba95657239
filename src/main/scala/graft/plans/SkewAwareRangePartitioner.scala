package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD

/** Skew-hardened monotonic range partitioning for the interval-stab join's
  * POINT side (see [[IntervalStabJoinStrategy]]).
  *
  * A plain [[org.apache.spark.RangePartitioner]] cannot split a single hot
  * point key: every range partitioner is monotonic, so all points with key
  * k land in one partition and a 90%-on-one-key corpus runs as one
  * straggler task (the same property as any sort-merge join). This
  * partitioner detects hot keys from the SAME one-pass reservoir sample
  * that supplies the range bounds, gives each hot key `ceil(share/avg)`
  * dedicated SUB-PARTITIONS appended after the base range partitions, and
  * routes a hot point to `sub = hash(row bytes) mod splitFactor` — a
  * deterministic round-robin (content-hash, so map output is stable under
  * task retry) that spreads the key's points evenly. Intervals covering a
  * hot key replicate to ALL of its sub-partitions (the interval side of the
  * key was already concentrating in one task; the extra copies are the
  * standard skew-salting trade), so the per-partition sweep stays exact and
  * the join output is unchanged.
  *
  * Non-skewed corpora detect no hot keys and degrade to exactly the
  * range-partitioned behavior (zero extra partitions, identical cover).
  */
final class SkewAwareRangePartitioner(
    /** strictly increasing inclusive upper bounds; length = basePartitions-1 */
    val bounds: Array[Long],
    /** hot key -> (sub-partition offset, split factor >= 2) */
    val hotKeys: Map[Long, (Int, Int)]) extends Serializable {

  val basePartitions: Int = bounds.length + 1
  val numPartitions: Int = basePartitions + hotKeys.valuesIterator.map(_._2).sum

  private val hotSorted: Array[(Long, (Int, Int))] = hotKeys.toArray.sortBy(_._1)

  /** Monotonic base partition: first i with k <= bounds(i), else the last. */
  def basePartition(k: Long): Int = {
    var lo = 0; var hi = bounds.length
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (bounds(m) < k) lo = m + 1 else hi = m
    }
    lo
  }

  /** Destination for a point: hot keys fan out over their sub-partitions by
    * deterministic row-content hash; everything else takes the base range.
    */
  def pointPartition(k: Long, rowHash: Int): Int = hotKeys.get(k) match {
    case Some((off, s)) => basePartitions + off + ((rowHash & Int.MaxValue) % s)
    case None           => basePartition(k)
  }

  /** Every partition that may hold a point in [lo, hi]: the contiguous base
    * cover plus the sub-partitions of each hot key inside the span. A
    * superset is sound (the sweep re-checks bounds exactly); this one is
    * precise up to strictness at the endpoints, like the base cover.
    */
  def intervalCover(lo: Long, hi: Long): Iterator[Int] = {
    val base = (basePartition(lo) to basePartition(hi)).iterator
    val subs = hotSorted.iterator
      .filter { case (k, _) => k >= lo && k <= hi }
      .flatMap { case (_, (off, s)) =>
        (0 until s).iterator.map(basePartitions + off + _)
      }
    base ++ subs
  }
}

object SkewAwareRangePartitioner {

  /** Build from ONE sampling job over the point keys — a per-input-partition
    * reservoir weighted by partition count (the RangePartitioner recipe),
    * reused for BOTH the range bounds and the hot-key table, so skew
    * hardening costs no extra pass.
    *
    * A key is hot when its estimated row share is at least `hotFactor`
    * average partitions' worth; its split factor is `ceil(share / avg)`,
    * capped at the effective partition count.
    *
    * `maxRowsPerPartition` bounds the per-task sweep buffer: the reservoir
    * pass counts the point side EXACTLY (it sums per-partition counts), so
    * when `total / targetPartitions` exceeds the cap the partition count
    * GROWS to `ceil(total / cap)` instead of letting each task buffer an
    * unbounded slice. This is the 100 TB invariant — the sweep materializes
    * one partition of points per task, so rows-per-partition (not the
    * session's shuffle-partition setting) is what must stay constant as
    * data scales. Found the hard way: at the sf10 bracket (60M points),
    * 32 fixed partitions put ~1.9M buffered rows in each of 32 concurrent
    * tasks and OOM'd an 8 GB local[32] heap. The sample size stays
    * 20·targetPartitions, so bounds for a grown count are coarser — that
    * only affects balance (≥ ~10 samples/bound at the observed growth
    * factors), and pathological imbalance is what the hot-key table
    * handles.
    */
  def fromKeys(
      keys: RDD[Long],
      targetPartitions: Int,
      hotFactor: Double = 2.0,
      maxRowsPerPartition: Long = 1000000L): SkewAwareRangePartitioner = {
    val n0 = math.max(1, targetPartitions)
    // no n0 == 1 short-circuit: even a single requested partition must go
    // through the exact count below so `maxRowsPerPartition` can still GROW
    // the partition count — a session with shuffle.partitions=1 would
    // otherwise buffer the whole point side in one task (r15 ADVICE). When
    // total <= cap the bounds loop yields n-1 = 0 bounds, i.e. the same
    // single-partition result the old early return produced.
    val sampleSize = math.min(20.0 * n0, 1e6)
    val inputParts = math.max(1, keys.getNumPartitions)
    val perPart = math.max(1, math.ceil(3.0 * sampleSize / inputParts).toInt)
    val sketch: Array[(Long, Array[Long])] =
      keys.mapPartitionsWithIndex { (idx, it) =>
        // deterministic per-partition seed: the sample (hence the plan)
        // reproduces run to run
        val rng = new java.util.Random(0x9e3779b97f4a7c15L ^ idx)
        val reservoir = new Array[Long](perPart)
        var count = 0L
        while (it.hasNext) {
          val k = it.next()
          if (count < perPart) reservoir(count.toInt) = k
          else {
            val j = math.floor(rng.nextDouble() * (count + 1)).toLong
            if (j < perPart) reservoir(j.toInt) = k
          }
          count += 1
        }
        if (count == 0L) Iterator.empty
        else Iterator.single((count,
          java.util.Arrays.copyOf(reservoir, math.min(count, perPart.toLong).toInt)))
      }.collect()

    val total = sketch.map(_._1).sum.toDouble
    if (total == 0) return new SkewAwareRangePartitioner(Array.empty, Map.empty)

    // grow the partition count when the requested one would overshoot the
    // per-task buffer cap (see scaladoc); 16384 is a runaway backstop, two
    // orders past any corpus this repo benches
    val n = math.min(16384, math.max(n0,
      math.ceil(total / math.max(1L, maxRowsPerPartition).toDouble).toInt))

    // weight = rows each sampled key stands for in its input partition
    val weighted: Array[(Long, Double)] = sketch.flatMap { case (cnt, ks) =>
      val w = cnt.toDouble / ks.length
      ks.map(k => (k, w))
    }

    // hot keys: aggregated sample weight >= hotFactor average partitions
    val avg = total / n
    var off = 0
    val hot = weighted.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toSeq
      .filter { case (_, w) => w >= hotFactor * avg }
      .sortBy(_._1)
      .map { case (k, w) =>
        val s = math.min(n, math.ceil(w / avg).toInt)
        val e = k -> (off, s); off += s; e
      }.toMap

    // range bounds over the weighted sample (the determineBounds walk:
    // strictly increasing, one bound per `step` of cumulative weight)
    val sorted = weighted.sortBy(_._1)
    val step = total / n
    val bounds = ArrayBuffer.empty[Long]
    var cum = 0.0
    var target = step
    var last = Long.MinValue
    var hasLast = false
    var i = 0
    while (i < sorted.length && bounds.length < n - 1) {
      val (k, w) = sorted(i)
      cum += w
      if (cum >= target && (!hasLast || k > last)) {
        bounds += k; last = k; hasLast = true; target += step
      }
      i += 1
    }
    new SkewAwareRangePartitioner(bounds.toArray, hot)
  }
}
