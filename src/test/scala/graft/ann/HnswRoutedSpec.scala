package graft.ann

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Routed sharded HNSW (r17: the scale path past `hnswShardsFor`'s
  * 1024-shard fan-out cap — semantic cells + IVF-rule routing instead of
  * every-query-searches-every-shard). The DuckDB gate independently
  * re-derives routing and search; this spec covers what the gate can't:
  * determinism, the artifact's structural invariants (sub-sharding fires,
  * partition completeness), the query contracts, recall floors, and the
  * degenerate arms.
  */
class HnswRoutedSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def gateCfg(dir: String) =
    Ann.hnswRoutedTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
      col("vec_id") < 20, k = 5, numCells = 8, nProbeCells = 4, m = 8,
      ef = 64, maxShardRows = 64, lloydIters = 2, trainCap = 4096)

  test("deterministic across runs (gate config, sf0.001)") {
    val a = gateCfg(sf0001).collect().map(_.toString).toSeq
    val b = gateCfg(sf0001).collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("recall floor vs brute at the gate config (probe half the cells)") {
    // floors are tripwires just under the measured values on the
    // near-random gate corpora (the documented quantizer worst case —
    // recall tracks the probed fraction plus the planted-duplicate bonus:
    // a query's near-dups share its cell by construction)
    for ((dir, floor) <- Seq(sf0001 -> 0.60, sf001 -> 0.60)) {
      val brute = pairs(Ann.cosineTopK(Tables.embeddings(spark, dir),
        "vec_id", "embedding", col("vec_id") < 20, k = 5))
      val routed = pairs(gateCfg(dir))
      val recall = (brute intersect routed).size.toDouble / brute.size
      assert(recall >= floor, s"routed recall $recall below floor $floor at $dir")
    }
  }

  // title matches what is asserted (r17 ADVICE): full-probe routed is NOT
  // equal to hnswTopK (graph membership differs — semantic cells vs id-hash
  // shards — so per-graph top-k unions differ); what full probing removes
  // is the ROUTING approximation, so recall must dominate the half-probe
  // config and clear an absolute bar.
  test("nProbeCells == numCells removes the routing approximation: full-probe recall dominates the gate config and clears 0.90") {
    // nProbeCells == numCells removes the routing approximation: every
    // query searches every shard, so recall must dominate the 4-of-8 gate
    val emb = Tables.embeddings(spark, sf0001)
    val brute = pairs(Ann.cosineTopK(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5))
    val full = pairs(Ann.hnswRoutedTopK(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5, numCells = 8, nProbeCells = 8, m = 8,
      ef = 64, maxShardRows = 64))
    val half = pairs(gateCfg(sf0001))
    def recall(got: Set[(Long, Long)]) =
      (brute intersect got).size.toDouble / brute.size
    assert(recall(full) >= recall(half),
      s"full-probe recall ${recall(full)} must dominate half-probe ${recall(half)}")
    assert(recall(full) >= 0.90, s"full-probe recall ${recall(full)} < 0.90")
  }

  test("dump structure: sub-sharding fires, membership is a partition of the corpus, factors match production derivation") {
    val emb = Tables.embeddings(spark, sf001)
    val dump = Ann.hnswRoutedIndexDump(emb, "vec_id", "embedding",
      numCells = 8, m = 8, ef = 64, maxShardRows = 64)
    assert(dump.cents.length == 8)
    assert(dump.shardCells.length == dump.dumps.length)
    val nodesPerShard = dump.dumps.map(_.nodeLevels.length)
    assert(nodesPerShard.sum == 500, s"membership must partition the corpus: ${nodesPerShard.sum}")
    // per-cell node totals re-derive the production sub-shard factor rule
    val byCell = dump.shardCells.zip(nodesPerShard).groupBy(_._1)
      .map { case (c, a) => c -> a.map(_._2).sum }
    byCell.foreach { case (cell, n) =>
      val factor = math.max(1L, (n.toLong + 63) / 64).toInt
      val got = dump.shardCells.count(_ == cell)
      assert(got == factor,
        s"cell $cell: $got sub-shards for $n rows, expected $factor")
    }
    // sub-sharding must actually fire whenever a cell exceeds the target
    // (500 rows over <=8 k-means cells of near-random vectors — balance
    // good enough to hit 64 is asserted, not assumed)
    assert(byCell.exists(_._2 > 64),
      s"no cell exceeded the 64-row target ($byCell) — sub-sharding untested")
    assert(dump.dumps.length > byCell.size)
    // node ids are globally unique across shards (each vector in exactly
    // one graph — the no-dedup contract of the candidate union)
    val allIds = dump.dumps.flatMap(_.nodeLevels.map(_._1))
    assert(allIds.length == allIds.distinct.length)
  }

  test("dump is deterministic (same data -> same artifact)") {
    val emb = Tables.embeddings(spark, sf0001)
    def d() = Ann.hnswRoutedIndexDump(emb, "vec_id", "embedding",
      numCells = 8, m = 8, ef = 64, maxShardRows = 64)
    val (a, b) = (d(), d())
    assert(a.cents.map(_.toSeq).toSeq == b.cents.map(_.toSeq).toSeq)
    assert(a.shardCells.toSeq == b.shardCells.toSeq)
    assert(a.dumps.map(_.entryId).toSeq == b.dumps.map(_.entryId).toSeq)
    assert(a.dumps.map(_.adjacency.map { case (n, l, ns) =>
      (n, l, ns.toSeq) }.toSeq).toSeq ==
      b.dumps.map(_.adjacency.map { case (n, l, ns) =>
        (n, l, ns.toSeq) }.toSeq).toSeq)
  }

  test("maxQueries contract fails fast") {
    val emb = Tables.embeddings(spark, sf0001)
    val e = intercept[IllegalArgumentException] {
      Ann.hnswRoutedTopK(emb, "vec_id", "embedding", col("vec_id") >= 0,
        k = 5, numCells = 4, nProbeCells = 2, maxQueries = 10)
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("degenerate arms: single vector, all-identical vectors") {
    val spark0 = spark
    import spark0.implicits._
    val one = Seq((0L, Array.fill(4)(1.0f))).toDF("vec_id", "embedding")
    assert(pairs(Ann.hnswRoutedTopK(one, "vec_id", "embedding",
      col("vec_id") === 0, k = 3, numCells = 2, nProbeCells = 1)).isEmpty)
    val same = (0L until 12L).map(i => (i, Array.fill(4)(0.5f)))
      .toDF("vec_id", "embedding")
    val got = Ann.hnswRoutedTopK(same, "vec_id", "embedding",
      col("vec_id") < 2, k = 3, numCells = 2, nProbeCells = 2,
      maxShardRows = 4)
    // all-identical vectors: every cosine is 1.0, ties break by id; with
    // every cell probed the top-3 for query 0 is {1,2,3} minus any id the
    // hash spread isolated beyond reach — but with nProbeCells = numCells
    // all shards are searched, so the global merge sees ids 1..11
    val q0 = got.where(col("query_id") === 0)
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq
    assert(q0 == Seq(1L, 2L, 3L))
  }
}
