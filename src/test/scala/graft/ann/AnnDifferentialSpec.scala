package graft.ann

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col

/** r12: full-output differentials for the two remaining pinned ANN gates.
  * The frozen pins prove determinism + non-regression; these tests make
  * them CORROBORATED — `ann_hnsw_topk` and `ann_ivfpq_topk` must equal,
  * row for row, an independent single-threaded reimplementation
  * ([[NaiveAnn]]) built from the published algorithms and the documented
  * determinism pins, over the same corpus the gate reads. Any divergence
  * in graph construction, beam search, codebook training, ADC scoring, or
  * re-ranking fails here with the first differing row.
  */
class AnnDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(dir: String): Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, dir)
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
      .map { case (id, v) => (id, v.map(_.toDouble)) }

  private def gate(name: String, dir: String): Seq[(Long, Int, Long, Double)] =
    graft.SparkEntry.queries(name)(spark, dir)
      .select(col("query_id").cast("long"), col("rank"),
        col("neighbor_id").cast("long"), col("score"))
      .as[(Long, Int, Long, Double)].collect().toSeq

  private def diff(got: Seq[(Long, Int, Long, Double)],
      want: Seq[(Long, Int, Long, Double)]): Unit = {
    assert(got.nonEmpty, "gate returned no rows")
    assert(got.size == want.size, s"row counts differ: ${got.size} vs ${want.size}")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"first divergence at row $i: gate=$g naive=$w")
    }
  }

  test("ann_hnsw_topk equals the naive from-first-principles HNSW (sf0.001)") {
    val rows = corpus(sf0001)
    val queryIds = rows.map(_._1).filter(_ < 20).toSet
    diff(gate("ann_hnsw_topk", sf0001),
      NaiveAnn.hnswTopK(rows, queryIds, k = 5))
  }

  /** The sf0.001 gate run has ~62-node shards against ef = 64, so the
    * beam effectively exhausts each shard and the differential exercises
    * connectivity + re-rank but not beam PRUNING. This configuration
    * (2 shards of ~1000 nodes, ef = 12, m = 4) keeps the beam far smaller
    * than the shard, so early termination, the ef-cap drop rule, and
    * backlink pruning all bind — a perturbation of any of them diverges
    * the outputs (verified by mutating the naive side during development).
    */
  test("hnswTopK equals naive HNSW under beam pressure (sf0.1, ef=12, m=4)") {
    val dir = "/root/testdata/sf0.1"
    val rows = corpus(dir)
    val queryIds = rows.map(_._1).filter(_ < 20).toSet
    val got = Ann.hnswTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
        col("vec_id") < 20, k = 5, numShards = 2, m = 4, ef = 12)
      .select(col("query_id").cast("long"), col("rank"),
        col("neighbor_id").cast("long"), col("score"))
      .as[(Long, Int, Long, Double)].collect().toSeq
    diff(got, NaiveAnn.hnswTopK(rows, queryIds, k = 5,
      numShards = 2, m = 4, ef = 12))
  }

  test("ann_ivfpq_topk equals the naive IVF-ADC pipeline (sf0.001)") {
    val rows = corpus(sf0001)
    // the naive trainer uses every row as the sample; only valid under cap
    assert(rows.size <= 4096, "corpus exceeds the trainer cap; differential invalid")
    val queryIds = rows.map(_._1).filter(_ < 20).toSet
    diff(gate("ann_ivfpq_topk", sf0001),
      NaiveAnn.ivfPqTopK(rows, queryIds, k = 5))
  }
}
