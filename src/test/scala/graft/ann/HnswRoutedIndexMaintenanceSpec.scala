package graft.ann

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Maintenance lifecycle of the standing routed-HNSW index (r18.5):
  * [[Ann.HnswRoutedIndex.insert]] / [[Ann.HnswRoutedIndex.remove]] /
  * [[Ann.HnswRoutedIndex.compact]]. The load-bearing contract is EXACT
  * equality with a fresh [[Ann.buildHnswRoutedIndexWithCentroids]] over
  * the post-maintenance corpus at the SAME centroids (the standing
  * quantizer is part of the index's identity): shard builds are
  * deterministic in the row set and sub-shard membership is
  * id-deterministic, so insert-then-query and rebuild-then-query cannot
  * drift — which is also what lets the `ann_hnsw_index_inc` gate
  * hash-match the same routed DuckDB oracle as the fresh build.
  *
  * The second contract is MINIMAL REBUILD: only sub-shards that receive
  * a new id (or whose cell crossed a `maxShardRows` boundary) may
  * change; every other standing graph must be reused byte-for-byte.
  * Pinned white-box via [[Ann.HnswRoutedIndex.shardFingerprints]]
  * against a layout the spec re-derives from first principles.
  *
  * Both sides of the measured [[Ann.InsertRebuildCutover]] execute
  * here with the SAME bit-identity assertions: the parity-split insert
  * hits every cell (fraction 1.0 → the rebuild-inputs branch) while the
  * 3-row minimal-rebuild insert hits ≤3 of 8 cells (partial branch) —
  * the cutover picks inputs, never the relation.
  */
class HnswRoutedIndexMaintenanceSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def gateCents(dir: String): Array[Array[Double]] =
    Ann.trainIvfCentroids(Tables.embeddings(spark, dir), "vec_id",
      "embedding", numCells = 8)

  test("insert equality: prefix build + insert == fresh build over the union, same centroids (both SFs, factor flips included)") {
    for (dir <- Seq(sf0001, sf001)) {
      val emb = Tables.embeddings(spark, dir)
      val cents = gateCents(dir)
      // parity split at maxShardRows=64: cells sit near the boundary, so
      // the insert exercises BOTH the stable-cell partial rebuild and the
      // factor-flip whole-cell reshard paths
      val idx0 = Ann.buildHnswRoutedIndexWithCentroids(
        emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding", cents,
        m = 8, ef = 64, maxShardRows = 64)
      val idx1 = idx0.insert(emb.where(col("vec_id") % 2 === 1))
      val fresh = Ann.buildHnswRoutedIndexWithCentroids(
        emb, "vec_id", "embedding", cents, m = 8, ef = 64,
        maxShardRows = 64)
      try {
        assert(idx1.numShards == fresh.numShards,
          s"shard-count drift at $dir: ${idx1.numShards} vs ${fresh.numShards}")
        assert(idx1.shardFingerprints == fresh.shardFingerprints,
          s"standing graphs diverged from the fresh build at $dir")
        for (pred <- Seq(col("vec_id") < 20, col("vec_id") === 451)) {
          val got = rows(idx1.topK(pred, k = 5, nProbeCells = 4))
          val want = rows(fresh.topK(pred, k = 5, nProbeCells = 4))
          assert(got.nonEmpty && got == want,
            s"insert-then-query != rebuild-then-query at $dir ($pred)")
        }
      } finally { idx0.release(); idx1.release(); fresh.release() }
    }
  }

  test("minimal rebuild: a small insert touches exactly the predicted sub-shards; every other graph is reused byte-for-byte") {
    val emb = Tables.embeddings(spark, sf001)
    val cents = gateCents(sf001)
    val msr = 40 // multi-sub cells (~62 rows/cell at 500 rows / 8 cells)
    val base = emb.where(col("vec_id") < 497)
    val tail = emb.where(col("vec_id") >= 497) // 3 rows
    val idx0 = Ann.buildHnswRoutedIndexWithCentroids(
      base, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = msr)
    val idx1 = idx0.insert(tail)
    try {
      // re-derive the layout from first principles, driver-side
      def assign(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] =
        df.select("vec_id", "embedding").collect().map { r =>
          val v = r.getSeq[Float](1).map(_.toDouble).toArray
          val n = math.sqrt(v.map(x => x * x).sum)
          val vn = if (n == 0.0) v else v.map(_ / n)
          (Ann.nearestCell(vn, cents), r.getLong(0))
        }.toSeq
      val baseCells = assign(base).groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val tailAssign = assign(tail)
      val unionCells = (baseCells.keySet ++ tailAssign.map(_._1)).map { c =>
        c -> (baseCells.getOrElse(c, 0L) + tailAssign.count(_._1 == c))
      }.toMap
      val expectedChanged: Set[Long] = tailAssign.flatMap { case (c, id) =>
        val oldF = baseCells.get(c).map(n => Ann.routedSubFactorOf(n, msr))
        val newF = Ann.routedSubFactorOf(unionCells(c), msr)
        if (!oldF.contains(newF))
          // factor flipped (or new cell): the whole cell reshards
          (0 until newF).map(s => Ann.routedShardKey(c, s)) ++
            oldF.toSeq.flatMap(f => (0 until f).map(s => Ann.routedShardKey(c, s)))
        else Seq(Ann.routedShardKey(c, Ann.routedSubOf(id, newF)))
      }.toSet
      val before = idx0.shardFingerprints
      val after = idx1.shardFingerprints
      val changed = (before.keySet ++ after.keySet).filter { k =>
        before.get(k) != after.get(k)
      }
      assert(changed == expectedChanged,
        s"rebuild set mismatch: got $changed, predicted $expectedChanged")
      assert(changed.size < before.size,
        "a 3-row insert must not rebuild the whole index")
      (after.keySet -- changed).foreach { k =>
        assert(after(k) == before(k), s"untouched shard $k was rebuilt")
      }
    } finally { idx0.release(); idx1.release() }
  }

  test("chained inserts compose: three batches == one fresh build") {
    val emb = Tables.embeddings(spark, sf001)
    val cents = gateCents(sf001)
    val idx = Ann.buildHnswRoutedIndexWithCentroids(
      emb.where(col("vec_id") < 200), "vec_id", "embedding", cents,
      m = 8, ef = 64, maxShardRows = 64)
      .insert(emb.where(col("vec_id") >= 200 && col("vec_id") < 350))
      .insert(emb.where(col("vec_id") >= 350))
    val fresh = Ann.buildHnswRoutedIndexWithCentroids(
      emb, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = 64)
    try assert(idx.shardFingerprints == fresh.shardFingerprints &&
      rows(idx.topK(col("vec_id") < 10, k = 5, nProbeCells = 4)) ==
        rows(fresh.topK(col("vec_id") < 10, k = 5, nProbeCells = 4)))
    finally { idx.release(); fresh.release() }
  }

  test("insert contracts: id collision fails loud, checkIds=false skips, missing corpus column fails, empty insert is a no-op") {
    val emb = Tables.embeddings(spark, sf0001)
    val cents = gateCents(sf0001)
    val idx = Ann.buildHnswRoutedIndexWithCentroids(
      emb.where(col("vec_id") < 400), "vec_id", "embedding", cents,
      m = 8, ef = 64, maxShardRows = 64)
    try {
      val clash = intercept[IllegalArgumentException] {
        idx.insert(emb.where(col("vec_id") < 10))
      }
      assert(clash.getMessage.contains("shares ids"))
      // checkIds=false skips the scan (the duplicate then lands in the
      // graphs — caller-owned contract, here just proving the lever)
      idx.insert(emb.where(col("vec_id") < 10), checkIds = false).release()
      val missing = intercept[IllegalArgumentException] {
        idx.insert(emb.where(col("vec_id") >= 400).drop("label"))
      }
      assert(missing.getMessage.contains("label"))
      assert(idx.insert(emb.where(col("vec_id") < 0)) eq idx,
        "an empty insert must return the index unchanged")
    } finally idx.release()
  }

  test("insertNew collapses duplicate ids WITHIN a batch and skips standing ids (the at-least-once contract, r18 ADVICE)") {
    val emb = Tables.embeddings(spark, sf001)
    val cents = gateCents(sf001)
    val base = emb.where(col("vec_id") < 400)
    val tail = emb.where(col("vec_id") >= 400)
    val idx = Ann.buildHnswRoutedIndexWithCentroids(
      base, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = 64)
    // an at-least-once batch: every new row delivered twice, plus rows
    // whose ids already stand — insertNew must land as ONE copy of the
    // new rows and nothing else
    val dirty = tail.union(tail).union(emb.where(col("vec_id") < 30))
    val got = idx.insertNew(dirty)
    val fresh = Ann.buildHnswRoutedIndexWithCentroids(
      emb, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = 64)
    try {
      assert(got.shardFingerprints == fresh.shardFingerprints,
        "intra-batch duplicate ids leaked into the graphs")
      assert(rows(got.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)) ==
        rows(fresh.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)))
    } finally { idx.release(); got.release(); fresh.release() }
  }

  test("remove tombstones immediately: removed rows neither ask nor answer; compact equals a fresh build over the survivors") {
    val emb = Tables.embeddings(spark, sf001)
    val cents = gateCents(sf001)
    val pred = col("vec_id") >= 100 && col("vec_id") < 200
    val idx = Ann.buildHnswRoutedIndexWithCentroids(
      emb, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = 64)
    val tomb = idx.remove(pred)
    val compacted = tomb.compact()
    val fresh = Ann.buildHnswRoutedIndexWithCentroids(
      emb.where(not(pred)), "vec_id", "embedding", cents, m = 8, ef = 64,
      maxShardRows = 64)
    try {
      // tombstoned rows answer nothing…
      val ans = tomb.topK(col("vec_id") < 20, k = 5, nProbeCells = 8)
        .select("neighbor_id").collect().map(_.getLong(0))
      assert(ans.nonEmpty && ans.forall(id => id < 100 || id >= 200),
        "a tombstoned row surfaced as a neighbor before compact")
      // …and ask nothing
      assert(tomb.topK(col("vec_id") >= 100 && col("vec_id") < 110,
        k = 5, nProbeCells = 4).isEmpty,
        "a tombstoned row surfaced as a query before compact")
      // compact: bit-identical graphs + identical answers vs fresh build
      assert(compacted.shardFingerprints == fresh.shardFingerprints,
        "compacted graphs diverged from the fresh build over survivors")
      val got = rows(compacted.topK(col("vec_id") < 20, k = 5, nProbeCells = 4))
      val want = rows(fresh.topK(col("vec_id") < 20, k = 5, nProbeCells = 4))
      assert(got.nonEmpty && got == want)
      // reuse is pinned on a SPARSE delete (the 100-id predicate above
      // legitimately touches every sub-shard — splitmix64 spreads the
      // dense id block across the whole layout): one removed row may
      // rebuild at most its own sub-shard plus a factor-flipped cell
      val before = idx.shardFingerprints
      val one = idx.remove(col("vec_id") === 123).compact()
      try {
        val after = one.shardFingerprints
        val kept = after.keySet.filter(k => before.get(k).contains(after(k)))
        assert(kept.nonEmpty && kept.size >= before.size - 3,
          s"single-row compact rebuilt ${before.size - kept.size} shards")
      } finally one.release()
    } finally { idx.release(); compacted.release(); fresh.release() }
  }

  test("removes compose, inserts respect pending tombstones, and a no-match compact just clears") {
    val emb = Tables.embeddings(spark, sf0001)
    val cents = gateCents(sf0001)
    val idx = Ann.buildHnswRoutedIndexWithCentroids(
      emb.where(col("vec_id") < 400), "vec_id", "embedding", cents,
      m = 8, ef = 64, maxShardRows = 64)
    // two removes OR together; remove is declarative over the SERVED
    // relation, so a later insert matching the predicate is excluded too
    val maintained = idx.remove(col("vec_id") === 5)
      .remove(col("vec_id") >= 450)
      .insert(emb.where(col("vec_id") >= 400))
    try {
      val served = maintained.topK(col("vec_id") < 500, k = 3,
        nProbeCells = 8, maxQueries = 500)
        .select("query_id").distinct().collect().map(_.getLong(0)).toSet
      assert(!served.contains(5L) && served.forall(_ < 450L),
        "tombstone predicates must govern inserted rows too")
      assert(served.contains(420L), "a non-tombstoned inserted row must serve")
      // a compact whose predicate matches nothing standing clears cleanly
      val cleared = idx.remove(col("vec_id") === 99999).compact()
      assert(cleared.numShards == idx.numShards)
      assert(rows(cleared.topK(col("vec_id") < 10, k = 3, nProbeCells = 4)) ==
        rows(idx.topK(col("vec_id") < 10, k = 3, nProbeCells = 4)))
    } finally { idx.release(); maintained.release() }
  }
}
