package graft

import org.apache.spark.sql.SparkSession

/** One-off stage profile for ir_batch_bm25 (dev probe, not a test). */
object IrBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    import graft.text.Retrieval
    val docs = Tables.documents(spark, sfDir)
    val allTerms = Retrieval.QueryBatch.flatMap(_._2).distinct.sorted
    (1 to 3).foreach { i =>
      println(s"--- pass $i")
      val stats = time("observedStats (1 job)") {
        Retrieval.observedStats(docs, "doc_id", "text", allTerms)
      }
      val idfs = stats.perTerm.map { case (t, df, _) => (t, Retrieval.idf(stats.n, df)) }
      time("batchBm25TopK count") {
        Retrieval.batchBm25TopK(docs, "doc_id", "text", Retrieval.QueryBatch,
          idfs, Retrieval.avgdlOf(stats), 10).count()
      }
      time("full gate count") {
        spark.sparkContext.setJobGroup("irbatch", "gate job count probe")
        try SparkEntry.queries("ir_batch_bm25")(spark, sfDir).count()
        finally spark.sparkContext.clearJobGroup()
      }
      // NOTE: with AQE on, every shuffle-stage materialization is its own
      // job id, so this counts AQE stages, not logical passes — the gate
      // is 2 logical passes over the corpus (stats, scoring)
      val jobs = spark.sparkContext.statusTracker
        .getJobIdsForGroup("irbatch").length
      println(s"[probe] gate spark job ids so far (AQE-inflated): $jobs")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
