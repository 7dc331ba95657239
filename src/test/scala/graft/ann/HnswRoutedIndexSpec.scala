package graft.ann

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Standing routed-HNSW index (r18): the build/persist/query/release
  * lifecycle that replaces the transient path's no-persist adjudication.
  * The load-bearing contract is EXACT output equality with the transient
  * [[Ann.hnswRoutedTopK]] at the same (corpus, config, query batch) —
  * same trainer, assignment, hash-spread sub-sharding, graph build,
  * routing, beam, re-rank — which is also what lets the `ann_hnsw_index`
  * gate hash-match the routed DuckDB oracle.
  */
class HnswRoutedIndexSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("index topK == transient hnswRoutedTopK at the gate config (sf0.001 and sf0.01)") {
    for (dir <- Seq(sf0001, sf001)) {
      val emb = Tables.embeddings(spark, dir)
      val idx = Ann.buildHnswRoutedIndex(emb, "vec_id", "embedding",
        numCells = 8, m = 8, ef = 64, maxShardRows = 64)
      try {
        val got = rows(idx.topK(col("vec_id") < 20, k = 5, nProbeCells = 4))
        val want = rows(Ann.hnswRoutedTopK(emb, "vec_id", "embedding",
          col("vec_id") < 20, k = 5, numCells = 8, nProbeCells = 4, m = 8,
          ef = 64, maxShardRows = 64))
        assert(got.nonEmpty && got == want, s"index != transient at $dir")
      } finally idx.release()
    }
  }

  test("one build serves MANY batches, each equal to its transient twin (the amortization contract)") {
    val emb = Tables.embeddings(spark, sf001)
    val idx = Ann.buildHnswRoutedIndex(emb, "vec_id", "embedding",
      numCells = 8, m = 8, ef = 64, maxShardRows = 64)
    try {
      for (pred <- Seq(col("vec_id") < 10,
          col("vec_id") >= 100 && col("vec_id") < 110,
          col("vec_id") === 42)) {
        val got = rows(idx.topK(pred, k = 3, nProbeCells = 4))
        val want = rows(Ann.hnswRoutedTopK(emb, "vec_id", "embedding",
          pred, k = 3, numCells = 8, nProbeCells = 4, m = 8, ef = 64,
          maxShardRows = 64))
        assert(got == want, s"batch $pred diverged from the transient twin")
      }
    } finally idx.release()
  }

  test("a batch can widen nProbeCells on the standing graphs; full probe dominates half probe") {
    val emb = Tables.embeddings(spark, sf001)
    val brute = Ann.cosineTopK(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Ann.buildHnswRoutedIndex(emb, "vec_id", "embedding",
      numCells = 8, m = 8, ef = 64, maxShardRows = 64)
    try {
      def recall(nProbe: Int): Double = {
        val got = idx.topK(col("vec_id") < 20, k = 5, nProbeCells = nProbe)
          .select("query_id", "neighbor_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (brute intersect got).size.toDouble / brute.size
      }
      val full = recall(8)
      val half = recall(4)
      assert(full >= half, s"full-probe $full must dominate half-probe $half")
      assert(full >= 0.90, s"full-probe recall $full < 0.90")
    } finally idx.release()
  }

  test("release() is safe: queries after release recompute the lineage and stay correct") {
    val emb = Tables.embeddings(spark, sf0001)
    val idx = Ann.buildHnswRoutedIndex(emb, "vec_id", "embedding",
      numCells = 8, m = 8, ef = 64, maxShardRows = 64)
    val before = rows(idx.topK(col("vec_id") < 5, k = 3, nProbeCells = 4))
    idx.release()
    val after = rows(idx.topK(col("vec_id") < 5, k = 3, nProbeCells = 4))
    assert(before.nonEmpty && before == after)
  }

  test("maxQueries contract fails fast on the standing index too") {
    val emb = Tables.embeddings(spark, sf0001)
    val idx = Ann.buildHnswRoutedIndex(emb, "vec_id", "embedding",
      numCells = 4, m = 8, ef = 64, maxShardRows = 64)
    try {
      val e = intercept[IllegalArgumentException] {
        idx.topK(col("vec_id") >= 0, k = 5, nProbeCells = 2, maxQueries = 10)
      }
      assert(e.getMessage.contains("maxQueries"))
    } finally idx.release()
  }

  test("numShards matches the dump-derived shard count (build really covered every cell)") {
    val emb = Tables.embeddings(spark, sf001)
    val dump = Ann.hnswRoutedIndexDump(emb, "vec_id", "embedding",
      numCells = 8, m = 8, ef = 64, maxShardRows = 64)
    val idx = Ann.buildHnswRoutedIndex(emb, "vec_id", "embedding",
      numCells = 8, m = 8, ef = 64, maxShardRows = 64)
    try assert(idx.numShards == dump.dumps.length.toLong)
    finally idx.release()
  }
}
