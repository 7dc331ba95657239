package graft.text

/** Dev-only probe: cost of the dedup routing decision pass at sf0.1. */
object RouteStatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .appName("route-stats").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, d)
    docs.count() // warm the scan path
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val rs = Dedup.routeStats(docs, "text")
      println(f"RESULT run=$i routeStats sec=${(System.nanoTime() - t0) / 1e9}%.3f n=${rs.nDocs} dup=${rs.dupRatio}%.3f")
    }
    // and the semantic decision count
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val df = TextQueries.curateSemanticAuto(spark, d, 0.4)
      val n = df.count()
      println(f"RESULT run=$i semanticAuto sec=${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
    }
    spark.stop()
  }
}
