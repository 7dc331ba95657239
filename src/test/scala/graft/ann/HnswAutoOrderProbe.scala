package graft.ann

import org.apache.spark.sql.functions._

/** Dev-only probe (r19 close): adjudicates the sf100 envelope's
  * recurring "auto beats BOTH transient arms" reading
  * (`ann_hnsw_auto_prod` 135–140 s vs `ann_hnsw_prod` 160–168 s in the
  * r19 close artifact; 154.6 vs 213/243 in the graded r18 one).
  * The two rows execute PROVABLY IDENTICAL plans when the decision is
  * fan-out — `hnswShardsFor(2M, 32) = 123 = stats.fanoutShards`, same
  * m/ef/maxQueries — so any persistent gap must be run ORDER (JIT +
  * page-cache state), not a decision effect. The envelope always runs
  * the arm rows before the auto row; this probe times the SAME
  * fan-out call four times in A,B,B,A order and prints the sequence —
  * if position, not identity, explains the spread, the envelope's
  * fixed order is the confound (and the r20 fix is alternating arm
  * order inside the envelope, the same lesson as the gate-scale
  * order-bias A/B in COVERAGE's r19 close section).
  *
  * Env: SPARK_GRAFT_SF100_DIR (default /tmp/sf100).
  */
object HnswAutoOrderProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .appName("hnsw-order").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "/tmp/sf100")
    val emb = graft.Tables.embeddings(spark, d)
    println(s"ORDER corpus rows=${emb.count()} dir=$d")
    val ast = Ann.hnswRouteStats(emb, "vec_id", "embedding",
      col("vec_id") < 20, numCells = 128, nProbeCells = 64, cores = 32)
    println(s"ORDER fanout_shards=${ast.fanoutShards} use_routed=${ast.useRouted()}")

    def armDirect(): Unit = Ann.hnswTopK(
      graft.Tables.embeddings(spark, d), "vec_id", "embedding",
      col("vec_id") < 20, k = 5,
      numShards = Ann.hnswShardsFor(
        graft.Tables.embeddings(spark, d).count(), 32))
      .write.format("noop").mode("overwrite").save()
    def armAuto(): Unit = Ann.hnswAutoTopKFromStats(
      graft.Tables.embeddings(spark, d), "vec_id", "embedding",
      col("vec_id") < 20, k = 5, nProbeCells = 64, m = 16, ef = 128,
      maxShardRows = 16384, maxQueries = 4096, ast)
      .write.format("noop").mode("overwrite").save()

    val seq = Seq("direct" -> (() => armDirect()), "auto" -> (() => armAuto()),
      "auto" -> (() => armAuto()), "direct" -> (() => armDirect()))
    seq.zipWithIndex.foreach { case ((label, f), i) =>
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f()
      println(f"ORDER pos=$i arm=$label sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
