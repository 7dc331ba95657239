package graft.ann

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The routed-vs-fan-out auto chooser (r18, the dedup `routeStats`
  * pattern on the ANN axis): the decision inputs, both branches'
  * equality with their explicit twins, and the cutover seam.
  */
class HnswAutoSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("route stats: bounded fields, probed union within [nProbeCells-ish, numCells], deterministic") {
    val emb = Tables.embeddings(spark, sf001)
    def stats() = Ann.hnswRouteStats(emb, "vec_id", "embedding",
      col("vec_id") < 20, numCells = 8, nProbeCells = 4, cores = 8)
    val s = stats()
    assert(s.nQueries == 20)
    assert(s.numCells == 8)
    assert(s.probedUnionCells >= 4 && s.probedUnionCells <= 8,
      s"union ${s.probedUnionCells} out of range")
    assert(s.corpusRows == 500)
    assert(s.fanoutShards == 8) // cores floor at this corpus size
    assert(s.unionFraction == s.probedUnionCells / 8.0)
    val t = stats()
    assert(t.probedUnionCells == s.probedUnionCells &&
      t.cents.map(_.toSeq).toSeq == s.cents.map(_.toSeq).toSeq,
      "route stats must be deterministic")
  }

  test("a diverse 20-query batch re-covers the cells -> fan-out branch, output == hnswTopK at fanoutShards") {
    val emb = Tables.embeddings(spark, sf001)
    val stats = Ann.hnswRouteStats(emb, "vec_id", "embedding",
      col("vec_id") < 20, numCells = 8, nProbeCells = 4, cores = 8)
    // 20 near-random queries x top-4 of 8 cells: the union is the full
    // cell set on the gate corpus — asserted, not assumed (if the data
    // ever changes this test tells us the gate's pinned branch moved)
    assert(!stats.useRouted(), s"expected fan-out at union fraction ${stats.unionFraction}")
    val got = rows(Ann.hnswAutoTopKFromStats(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5, nProbeCells = 4, m = 8, ef = 64,
      maxShardRows = 64, maxQueries = 4096, stats))
    val want = rows(Ann.hnswTopK(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5, numShards = stats.fanoutShards, m = 8, ef = 64))
    assert(got.nonEmpty && got == want)
  }

  test("a single-query batch probes a small union -> routed branch, output == hnswRoutedTopK on the same centroids") {
    val emb = Tables.embeddings(spark, sf001)
    val stats = Ann.hnswRouteStats(emb, "vec_id", "embedding",
      col("vec_id") === 0, numCells = 8, nProbeCells = 2, cores = 8)
    assert(stats.nQueries == 1 && stats.probedUnionCells == 2)
    assert(stats.useRouted(), s"expected routed at union fraction ${stats.unionFraction}")
    val got = rows(Ann.hnswAutoTopKFromStats(emb, "vec_id", "embedding",
      col("vec_id") === 0, k = 5, nProbeCells = 2, m = 8, ef = 64,
      maxShardRows = 64, maxQueries = 4096, stats))
    val want = rows(Ann.hnswRoutedTopKWithCentroids(emb, "vec_id", "embedding",
      col("vec_id") === 0, k = 5, nProbeCells = 2, m = 8, ef = 64,
      maxShardRows = 64, maxQueries = 4096, stats.cents))
    assert(got.nonEmpty && got == want)
  }

  test("the cutover is a real seam: forcing it flips the branch on the same stats") {
    val emb = Tables.embeddings(spark, sf0001)
    val stats = Ann.hnswRouteStats(emb, "vec_id", "embedding",
      col("vec_id") < 20, numCells = 8, nProbeCells = 4, cores = 8)
    def auto(cutover: Double) = rows(Ann.hnswAutoTopKFromStats(
      emb, "vec_id", "embedding", col("vec_id") < 20, k = 5,
      nProbeCells = 4, m = 8, ef = 64, maxShardRows = 64,
      maxQueries = 4096, stats, cutover))
    val forcedRouted = auto(cutover = 1.0) // union fraction <= 1 always
    val forcedFanout = auto(cutover = 0.0) // nothing routes below 0+
    val routedTwin = rows(Ann.hnswRoutedTopKWithCentroids(emb, "vec_id",
      "embedding", col("vec_id") < 20, k = 5, nProbeCells = 4, m = 8,
      ef = 64, maxShardRows = 64, maxQueries = 4096, stats.cents))
    val fanoutTwin = rows(Ann.hnswTopK(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5, numShards = stats.fanoutShards, m = 8, ef = 64))
    assert(forcedRouted == routedTwin)
    assert(forcedFanout == fanoutTwin)
  }

  test("hnswAutoTopK end-to-end (stats computed inside) matches the FromStats composition") {
    val emb = Tables.embeddings(spark, sf0001)
    val stats = Ann.hnswRouteStats(emb, "vec_id", "embedding",
      col("vec_id") < 20, numCells = 8, nProbeCells = 4, cores = 8)
    val composed = rows(Ann.hnswAutoTopKFromStats(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5, nProbeCells = 4, m = 8, ef = 64,
      maxShardRows = 64, maxQueries = 4096, stats))
    val oneShot = rows(Ann.hnswAutoTopK(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5, numCells = 8, nProbeCells = 4, m = 8,
      ef = 64, maxShardRows = 64, cores = 8))
    assert(oneShot == composed)
  }

  test("maxQueries contract fails fast in the stats pass") {
    val emb = Tables.embeddings(spark, sf0001)
    val e = intercept[IllegalArgumentException] {
      Ann.hnswRouteStats(emb, "vec_id", "embedding", col("vec_id") >= 0,
        numCells = 4, nProbeCells = 2, maxQueries = 10)
    }
    assert(e.getMessage.contains("maxQueries"))
  }
}
