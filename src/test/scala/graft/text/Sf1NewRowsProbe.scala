package graft.text

/** Dev-only probe: first-run validation of the r15 sf1 envelope rows
  * (retrieval + semantic curation) before the graded bench run.
  */
object Sf1NewRowsProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .appName("sf1-new-rows").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    for (name <- Seq("ir_term_stats", "ir_batch_bm25",
        "cur_semantic", "cur_semantic_ivf")) {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, d)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"RESULT $name sec=${runs.min}%.2f sec_max=${runs.max}%.2f")
    }
    spark.stop()
  }
}
