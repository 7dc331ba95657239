package graft.ann

import org.apache.spark.sql.functions._

/** Dev-only probe (r18.5): the two-level quantizer buys a 61× cheaper
  * assignment pass at the 10k-cell bracket (AnnAssignCostProbe) — this
  * probe measures what that costs in RECALL at the 10× corpus
  * (/tmp/sf10dup, 200k×64, the structureless worst case), flat vs
  * two-level at the SAME probed fraction. On structureless data recall
  * is bounded by the probed fraction for BOTH quantizers; the
  * two-level-specific loss is the hierarchical boundary effect (a true
  * neighbor assigned under a super-cell the query doesn't probe), which
  * this probe isolates by matching fractions. nProbeSuper is the
  * recovery lever — the sweep shows its price curve.
  *
  * Env: SPARK_GRAFT_SF10DUP_DIR (default /tmp/sf10dup),
  * SPARK_GRAFT_PROBE_QUERIES (default 50).
  */
object TwoLevelRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .appName("twolevel-recall").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val d = sys.env.getOrElse("SPARK_GRAFT_SF10DUP_DIR", "/tmp/sf10dup")
    val nQ = sys.env.getOrElse("SPARK_GRAFT_PROBE_QUERIES", "50").toInt
    val emb = graft.Tables.embeddings(spark, d)
    val pred = col("vec_id") < nQ
    val k = 5

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    val t0 = System.nanoTime()
    val brute = pairs(Ann.cosineTopK(emb, "vec_id", "embedding", pred, k))
    println(f"TWOLEVEL brute truth n=${brute.size} " +
      f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")

    def arm(label: String, fraction: Double)(
        run: () => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      val got = pairs(run())
      val sec = (System.nanoTime() - t) / 1e9
      val recall = (brute intersect got).size.toDouble / brute.size
      println(f"TWOLEVEL arm=$label fraction=$fraction%.3f " +
        f"recall=$recall%.3f wall_sec=$sec%.1f")
      spark.catalog.clearCache(); System.gc()
    }

    // reference: the shipped flat routed config (committed 0.944 at 0.5)
    arm("flat_64c_probe32", 0.5)(() => Ann.hnswRoutedTopK(
      emb, "vec_id", "embedding", pred, k,
      numCells = 64, nProbeCells = 32, m = 16, ef = 128))

    // two-level at the SAME 64 cells / 0.5 fraction, sweeping the
    // nProbeSuper lever: 4/8 supers probed (children fully ranked)
    for (nSuper <- Seq(2, 4, 8)) {
      val q = Ann.trainIvfCentroidsTwoLevel(emb, "vec_id", "embedding",
        numSuper = 8, cellsPerSuper = 8, nProbeSuper = nSuper)
      val nCells = math.min(32, nSuper * 8)
      arm(s"twolevel_8x8_super$nSuper", nCells / 64.0)(() =>
        Ann.hnswRoutedTopKTwoLevel(
          emb, "vec_id", "embedding", pred, k, q,
          nProbeCells = nCells, m = 16, ef = 128))
    }

    // CLUSTERED corpus (the production regime fine cells exist for:
    // 200 planted centers, σ=0.05 — the RecallFrontierProbe clustered
    // family's shape): super-cells should align with real structure, so
    // the boundary effect measured above on structureless data should
    // shrink at matched small fractions.
    val rng = new scala.util.Random(7)
    val centers = Array.fill(200)(Array.fill(64)(rng.nextGaussian()))
      .map { c => val n = math.sqrt(c.map(x => x * x).sum); c.map(_ / n) }
    val centersB = spark.sparkContext.broadcast(centers)
    val cluEmb = spark.range(0L, 200000L, 1L, 32).rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val prng = new scala.util.Random(42L ^ (pid.toLong * 0x9e3779b9L))
        val cs = centersB.value
        it.map { i =>
          val c = cs((i % 200).toInt)
          (i, c.map(x => (x + 0.05 * prng.nextGaussian()).toFloat))
        }
      }
      .toDF("vec_id", "embedding")
    cluEmb.persist()
    val ct0 = System.nanoTime()
    val cluBrute = pairs(Ann.cosineTopK(cluEmb, "vec_id", "embedding", pred, k))
    println(f"TWOLEVEL clustered truth n=${cluBrute.size} " +
      f"sec=${(System.nanoTime() - ct0) / 1e9}%.1f")
    def cluArm(label: String, fraction: Double)(
        run: () => org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      val got = pairs(run())
      val sec = (System.nanoTime() - t) / 1e9
      val recall = (cluBrute intersect got).size.toDouble / cluBrute.size
      println(f"TWOLEVEL arm=$label fraction=$fraction%.3f " +
        f"recall=$recall%.3f wall_sec=$sec%.1f")
      spark.catalog.clearCache(); System.gc()
    }
    cluArm("clu_flat_64c_probe8", 8 / 64.0)(() => Ann.hnswRoutedTopK(
      cluEmb, "vec_id", "embedding", pred, k,
      numCells = 64, nProbeCells = 8, m = 16, ef = 128))
    val qClu = Ann.trainIvfCentroidsTwoLevel(cluEmb, "vec_id", "embedding",
      numSuper = 8, cellsPerSuper = 8, nProbeSuper = 2)
    cluArm("clu_twolevel_8x8_super2_probe8", 8 / 64.0)(() =>
      Ann.hnswRoutedTopKTwoLevel(
        cluEmb, "vec_id", "embedding", pred, k, qClu,
        nProbeCells = 8, m = 16, ef = 128))
    cluEmb.unpersist()
  }
}
