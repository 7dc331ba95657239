package graft.ann

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Two-level coarse quantizer (r18.5): the productized answer to the
  * measured flat-assignment cliff (AnnAssignCostProbe at 2M×64: 7.5 s at
  * 128 cells → 841 s at 10240, linear in numCells; a balanced hierarchy
  * pays ~2√C dots instead). The load-bearing pin is the DEGENERATE
  * equality: at `numSuper = 1` the two-level trainer consumes the same
  * bounded sample through the same Lloyd fold as the flat trainer, so
  * quantizer, routing, and the whole routed probe are BIT-IDENTICAL to
  * the gated flat path — the new code is tied to the hash-gated one, not
  * merely near it.
  */
class TwoLevelQuantizerSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def normalized(dir: String, n: Int): Seq[Array[Double]] =
    Tables.embeddings(spark, dir).where(col("vec_id") < n)
      .select("embedding").collect().map { r =>
        val v = r.getSeq[Float](0).map(_.toDouble).toArray
        val nrm = math.sqrt(v.map(x => x * x).sum)
        if (nrm == 0.0) v else v.map(_ / nrm)
      }.toSeq

  test("numSuper=1 degenerates to the flat quantizer bit-for-bit: assignment, routing, and the full routed probe") {
    val emb = Tables.embeddings(spark, sf001)
    val flat = Ann.trainIvfCentroids(emb, "vec_id", "embedding", numCells = 8)
    val two = Ann.trainIvfCentroidsTwoLevel(emb, "vec_id", "embedding",
      numSuper = 1, cellsPerSuper = 8, nProbeSuper = 1)
    assert(two.numCells == 8)
    // same sample, same fold: the child matrix IS the flat matrix
    assert(two.l2(0).map(_.toSeq).toSeq == flat.map(_.toSeq).toSeq,
      "numSuper=1 children diverged from the flat trainer")
    normalized(sf001, 50).foreach { vn =>
      assert(two.assign(vn) == Ann.nearestCell(vn, flat))
    }
    val got = rows(Ann.hnswRoutedTopKTwoLevel(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5, two, nProbeCells = 4, m = 8, ef = 64,
      maxShardRows = 64))
    val want = rows(Ann.hnswRoutedTopKWithCentroids(emb, "vec_id",
      "embedding", col("vec_id") < 20, k = 5, nProbeCells = 4, m = 8,
      ef = 64, maxShardRows = 64, maxQueries = 4096, flat))
    assert(got.nonEmpty && got == want,
      "degenerate two-level routed probe diverged from the flat path")
  }

  test("training is deterministic and assignment matches the driver-side quantizer everywhere") {
    val emb = Tables.embeddings(spark, sf001)
    val a = Ann.trainIvfCentroidsTwoLevel(emb, "vec_id", "embedding",
      numSuper = 4, cellsPerSuper = 2, nProbeSuper = 2)
    val b = Ann.trainIvfCentroidsTwoLevel(emb, "vec_id", "embedding",
      numSuper = 4, cellsPerSuper = 2, nProbeSuper = 2)
    assert(a.l1.map(_.toSeq).toSeq == b.l1.map(_.toSeq).toSeq &&
      a.l2.map(_.map(_.toSeq).toSeq).toSeq == b.l2.map(_.map(_.toSeq).toSeq).toSeq)
    assert(a.numCells == 8 && a.offsets.toSeq == Seq(0, 2, 4, 6))
    // the distributed assignment pass == the driver-side quantizer
    import spark.implicits._
    val assigned = Ann.assignCellsTwoLevel(emb, "vec_id", "embedding", a)
      .as[(Long, Int)].collect().toMap
    assert(assigned.values.forall(c => c >= 0 && c < a.numCells))
    val byId = Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect().map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val nrm = math.sqrt(v.map(x => x * x).sum)
        r.getLong(0) -> a.assign(if (nrm == 0.0) v else v.map(_ / nrm))
      }.toMap
    assert(assigned == byId)
  }

  test("hierarchical routing: full probe clears 0.90 recall and dominates a half-super probe (the nProbeSuper recovery lever)") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001)
    val brute = Ann.cosineTopK(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(nSuper: Int, nCells: Int): Double = {
      val q = Ann.trainIvfCentroidsTwoLevel(emb, "vec_id", "embedding",
        numSuper = 4, cellsPerSuper = 2, nProbeSuper = nSuper)
      val got = Ann.hnswRoutedTopKTwoLevel(emb, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, q, nProbeCells = nCells, m = 8,
        ef = 64, maxShardRows = 64)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (brute intersect got).size.toDouble / brute.size
    }
    val full = recall(4, 8)
    val half = recall(2, 4)
    assert(full >= half, s"full probe $full must dominate half probe $half")
    assert(full >= 0.90, s"full-probe recall $full < 0.90")
  }

  test("quantizer contracts fail loud") {
    intercept[IllegalArgumentException] {
      Ann.TwoLevelQuantizer(Array(Array(1.0)), Array.empty, 1)
    }
    intercept[IllegalArgumentException] {
      Ann.TwoLevelQuantizer(Array(Array(1.0)), Array(Array(Array(1.0))), 2)
    }
    val emb = Tables.embeddings(spark, sf0001)
    intercept[IllegalArgumentException] {
      Ann.trainIvfCentroidsTwoLevel(emb, "vec_id", "embedding",
        numSuper = 0, cellsPerSuper = 2, nProbeSuper = 1)
    }
    // r19 (r18 ADVICE): a probe budget past the probed supers' child pool
    // fails loud instead of silently probing fewer cells than asked
    val two = Ann.trainIvfCentroidsTwoLevel(emb, "vec_id", "embedding",
      numSuper = 4, cellsPerSuper = 2, nProbeSuper = 1)
    val e = intercept[IllegalArgumentException] {
      two.route(Array.fill(64)(0.1), nProbeCells = 3) // pool = 1×2
    }
    assert(e.getMessage.contains("nProbeSuper"))
  }

  // r19 (r18 verdict ask #3): the CoarseQuantizer seam wired into the
  // STANDING index — the degeneracy pin and the maintenance bit-identity
  // extended to the lifecycle.

  test("standing index at numSuper=1 is bit-identical to the flat standing index: graphs, served rows, inserts") {
    val emb = Tables.embeddings(spark, sf001)
    val flatCents = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
      numCells = 8)
    val two = Ann.trainIvfCentroidsTwoLevel(emb, "vec_id", "embedding",
      numSuper = 1, cellsPerSuper = 8, nProbeSuper = 1)
    val base = emb.where(col("vec_id") < 400)
    val tail = emb.where(col("vec_id") >= 400)
    val flatIdx = Ann.buildHnswRoutedIndexWithCentroids(
      base, "vec_id", "embedding", flatCents, m = 8, ef = 64,
      maxShardRows = 64)
    val twoIdx = Ann.buildHnswRoutedIndexTwoLevel(
      base, "vec_id", "embedding", two, m = 8, ef = 64, maxShardRows = 64)
    val flatGrown = flatIdx.insert(tail)
    val twoGrown = twoIdx.insert(tail)
    try {
      assert(twoIdx.shardFingerprints == flatIdx.shardFingerprints,
        "degenerate two-level standing graphs diverged from flat")
      assert(rows(twoIdx.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)) ==
        rows(flatIdx.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)))
      assert(twoGrown.shardFingerprints == flatGrown.shardFingerprints,
        "degenerate two-level INSERT assignment diverged from flat")
    } finally {
      flatIdx.release(); twoIdx.release()
      flatGrown.release(); twoGrown.release()
    }
  }

  test("two-level standing maintenance: prefix build + insert == fresh build; remove+compact == fresh build over survivors") {
    val emb = Tables.embeddings(spark, sf001)
    val quant = Ann.trainIvfCentroidsTwoLevel(emb, "vec_id", "embedding",
      numSuper = 2, cellsPerSuper = 4, nProbeSuper = 2)
    val grown = Ann.buildHnswRoutedIndexTwoLevel(
      emb.where(col("vec_id") % 2 === 0), "vec_id", "embedding", quant,
      m = 8, ef = 64, maxShardRows = 64)
      .insert(emb.where(col("vec_id") % 2 === 1))
    val fresh = Ann.buildHnswRoutedIndexTwoLevel(
      emb, "vec_id", "embedding", quant, m = 8, ef = 64, maxShardRows = 64)
    val pred = col("vec_id") >= 100 && col("vec_id") < 200
    val compacted = fresh.remove(pred).compact()
    val freshSurvivors = Ann.buildHnswRoutedIndexTwoLevel(
      emb.where(not(pred)), "vec_id", "embedding", quant, m = 8, ef = 64,
      maxShardRows = 64)
    try {
      assert(grown.shardFingerprints == fresh.shardFingerprints,
        "two-level insert-then-query != rebuild-then-query")
      assert(rows(grown.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)) ==
        rows(fresh.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)))
      assert(compacted.shardFingerprints == freshSurvivors.shardFingerprints,
        "two-level compact diverged from a fresh build over survivors")
    } finally {
      grown.release(); fresh.release()
      compacted.release(); freshSurvivors.release()
    }
  }
}
