package graft.ann

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r15 verdict ask #6 (preset/gate split): the ANN gates pin PEDAGOGICAL
  * configs whose embedded-literal oracles (hyperplane VALUES rows, trained
  * centroid/PQ/HNSW artifacts) were derived AT those configs, while the
  * shipped CLI defaults are the r15-measured recall presets (lsh 4×16,
  * mp-lsh 6×16, ivf nProbe 8). A change to a shipped DEFAULT must never
  * silently shift a gate's result — the gate lambdas must pass every
  * preset-tunable parameter explicitly. This spec enforces that
  * BEHAVIORALLY: each gate's output must equal a call with the gate
  * config spelled out. If someone drops the explicit args from a gate
  * lambda (so it starts tracking the defaults) and the defaults move,
  * these comparisons break loudly instead of the oracle drifting.
  */
class AnnGateConfigSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("ann gate outputs equal their explicitly-pinned configs") {
    val d = sf0001
    val emb = graft.Tables.embeddings(spark, d)

    // lsh gate pins 8 planes × 8 tables (shipped default: 4×16)
    assert(rows(graft.SparkEntry.queries("ann_lsh_topk")(spark, d)) ==
      rows(Ann.lshTopK(emb, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, dim = 64, numPlanes = 8, tables = 8)))

    // multi-probe gate pins 8×8 with 1-BIT probes (shipped default:
    // 6×16×2-bit since r17 — the oracle's candidate rule is
    // bit_count(xor) <= 1, so probeBits is gate-pinned too)
    assert(rows(graft.SparkEntry.queries("ann_lsh_mp_topk")(spark, d)) ==
      rows(Ann.lshMultiProbeTopK(emb, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, dim = 64, numPlanes = 8, tables = 8,
        probeBits = 1)))

    // ivf gate pins nProbe=4 over the 16-cell/2-iter/4096-cap trainer
    // (shipped default: nProbe=8)
    val cents = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
      numCells = 16, lloydIters = 2, trainCap = 4096)
    assert(rows(graft.SparkEntry.queries("ann_ivf_topk")(spark, d)) ==
      rows(Ann.ivfTopKWithCentroids(emb, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, nProbe = 4, cents)))

    // ivfpq gate pins nProbe=4, candidateFactor=8 on the 16/8/16
    // pedagogical trainer (shipped default since r18: 64/32/m16/ks256/cf64)
    Ann.trainIvfPq(emb, "vec_id", "embedding", numCells = 16, m = 8,
      ks = 16, lloydIters = 2, trainCap = 4096).foreach { model =>
      assert(rows(graft.SparkEntry.queries("ann_ivfpq_topk")(spark, d)) ==
        rows(Ann.ivfPqTopKWithModel(emb, "vec_id", "embedding",
          col("vec_id") < 20, k = 5, nProbe = 4, candidateFactor = 8, model)))
    }

    // hnsw gate pins 8 shards / m=8 / ef=64 — the embedded oracle dump is
    // trained at exactly this shard count (shard assignment changes the
    // graphs), while scale paths may raise shards for build parallelism
    assert(rows(graft.SparkEntry.queries("ann_hnsw_topk")(spark, d)) ==
      rows(Ann.hnswTopK(emb, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, numShards = 8, m = 8, ef = 64)))

    // routed-hnsw gate pins 8 cells / probe 4 / m=8 / ef=64 / 64-row
    // sub-shard target over the 2-iter/4096-cap trainer — the embedded
    // oracle artifact (centroids + cell graphs) is trained at exactly
    // these values, while shipped defaults (64 cells, probe 32, m=16,
    // ef=128, 16384-row target) track the measured presets
    assert(rows(graft.SparkEntry.queries("ann_hnsw_routed")(spark, d)) ==
      rows(Ann.hnswRoutedTopK(emb, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, numCells = 8, nProbeCells = 4, m = 8,
        ef = 64, maxShardRows = 64, lloydIters = 2, trainCap = 4096)))

    // auto gate pins the routed gate's 8/4/8/64/64 decision config at
    // cores=8 (shipped defaults: 64 cells / probe 32 / m=16 / ef=128) —
    // AND the decision itself: 20 gate queries re-cover the 8 cells, so
    // the taken branch must be fan-out at the 8/8/64 gate graphs
    val stats = Ann.hnswRouteStats(emb, "vec_id", "embedding",
      col("vec_id") < 20, numCells = 8, nProbeCells = 4, cores = 8)
    assert(!stats.useRouted(),
      s"gate decision moved: union fraction ${stats.unionFraction}")
    assert(rows(graft.SparkEntry.queries("ann_hnsw_auto")(spark, d)) ==
      rows(Ann.hnswTopK(emb, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, numShards = 8, m = 8, ef = 64)))

    // standing-index gate pins the routed gate config and must EQUAL the
    // transient routed gate (the lifecycle changes execution, never the
    // relation)
    assert(rows(graft.SparkEntry.queries("ann_hnsw_index")(spark, d)) ==
      rows(graft.SparkEntry.queries("ann_hnsw_routed")(spark, d)))

    // incremental-maintenance gate (r18.5): build-then-insert must ALSO
    // equal the transient routed gate — insert's bit-identity contract
    // surfaced at the gate config
    assert(rows(graft.SparkEntry.queries("ann_hnsw_index_inc")(spark, d)) ==
      rows(graft.SparkEntry.queries("ann_hnsw_routed")(spark, d)))

    // compact gate (r18.5): build-remove-compact equals the TRANSIENT
    // routed probe over the surviving corpus at the FULL-corpus
    // centroids — compact's bit-identity contract at the gate config
    val survivors = emb.where(not(col("vec_id") % 5 === 3))
    val fullCents = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
      numCells = 8)
    assert(rows(graft.SparkEntry.queries("ann_hnsw_index_compact")(spark, d)) ==
      rows(Ann.hnswRoutedTopKWithCentroids(survivors, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, nProbeCells = 4, m = 8, ef = 64,
        maxShardRows = 64, maxQueries = 4096, fullCents)))
  }
}
