package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** r15 (verdict ask #7): the degenerate corpora whose dumps exercise the
  * hnsw oracle's sentinel arms — single-vector shards (no adjacency
  * rows), empty query sets, all-identical vectors (every distance ties),
  * and zero vectors (the no-normalize guard). The Spark probe must stay
  * exact vs brute force on all of them, and the driver-side dump must
  * represent them without inventing links.
  */
class HnswDegenerateSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: Seq[(Long, Array[Double])]) =
    rows.toDF("vec_id", "embedding")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("one vector: no self-match, dump has the node but zero links") {
    val one = emb(Seq((0L, Array(1.0, 0.0, 0.0, 0.0))))
    assert(pairs(Ann.hnswTopK(one, "vec_id", "embedding",
      col("vec_id") < 20, k = 3)).isEmpty)
    val dump = Ann.hnswIndexDump(one, "vec_id", "embedding")
    assert(dump.map(_.nodeLevels.length).sum == 1)
    assert(dump.flatMap(_.adjacency).forall(_._3.isEmpty),
      "a lone node cannot have neighbors")
  }

  test("two vectors: each finds the other exactly") {
    val two = emb(Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.9, 0.1, 0.0, 0.0))))
    val got = pairs(Ann.hnswTopK(two, "vec_id", "embedding",
      col("vec_id") < 20, k = 3))
    assert(got == Set((0L, 1L), (1L, 0L)))
  }

  test("all-identical vectors: ties break deterministically, brute == hnsw") {
    val same = emb((0L until 12L).map(i => (i, Array(0.5, 0.5, 0.5, 0.5))))
    val brute = pairs(Ann.cosineTopK(same, "vec_id", "embedding",
      col("vec_id") < 12, k = 3))
    val hnsw = pairs(Ann.hnswTopK(same, "vec_id", "embedding",
      col("vec_id") < 12, k = 3, numShards = 2))
    // every neighbor ties at cosine 1.0 — both paths must resolve ties
    // by id and return identical pair sets, twice in a row
    assert(hnsw == brute)
    assert(pairs(Ann.hnswTopK(same, "vec_id", "embedding",
      col("vec_id") < 12, k = 3, numShards = 2)) == hnsw)
  }

  test("zero vector present: no NaN, zero vector never a neighbor by score") {
    val withZero = emb(Seq(
      (0L, Array(0.0, 0.0, 0.0, 0.0)),
      (1L, Array(1.0, 0.0, 0.0, 0.0)),
      (2L, Array(0.8, 0.2, 0.0, 0.0)),
      (3L, Array(0.7, 0.3, 0.0, 0.0))))
    val rows = Ann.hnswTopK(withZero, "vec_id", "embedding",
      col("vec_id") < 4, k = 2).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r.getDouble(3).isNaN),
      "zero-norm guard must keep scores finite")
  }

  test("empty query predicate: empty result, well-typed schema") {
    val corpus = emb((0L until 6L).map(i =>
      (i, Array(i.toDouble, 1.0, 0.0, 0.0))))
    val out = Ann.hnswTopK(corpus, "vec_id", "embedding",
      col("vec_id") < 0, k = 3)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("query_id", "rank", "neighbor_id", "score"))
  }

  test("hnswShardsFor: cores floor, row-target growth, fan-out cap") {
    // the corpus-adaptive shard rule (r17 sf100 finding): cores dominate
    // small corpora (sf10dup's 200k rows stay at 32 — round-over-round
    // comparability), the row target drives big ones (2M → 123), and the
    // 1024 cap marks where brute query fan-out must yield to a routing
    // layer
    assert(Ann.hnswShardsFor(0L, 32) == 32)
    assert(Ann.hnswShardsFor(200000L, 32) == 32)
    assert(Ann.hnswShardsFor(2000000L, 32) == 123)
    assert(Ann.hnswShardsFor(123L * 16384L, 32) == 123)
    assert(Ann.hnswShardsFor(123L * 16384L + 1L, 32) == 124)
    assert(Ann.hnswShardsFor(Long.MaxValue / 4, 32) == 1024)
    assert(Ann.hnswShardsFor(1L, 8) == 8)
  }
}
