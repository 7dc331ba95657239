package graft.text

/** Dev-only probe: semantic-curation drop recall vs nProbe (not part of
  * the engine surface; informs the cur_semantic_ivf default).
  */
object SemIvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .appName("sem-ivf-probe").getOrCreate()
    import spark.implicits._
    val d = "/root/testdata/sf0.01"
    val brute = TextQueries.curateSemantic(spark, d, 0.4)
      .select("doc_id").as[Long].collect().toSet
    for (np <- Seq(2, 3, 4)) {
      val ivf = TextQueries.curateSemanticIvf(spark, d, 0.4, nProbe = np)
        .select("doc_id").as[Long].collect().toSet
      println(s"RESULT nProbe=$np misses=${(ivf -- brute).size} " +
        s"bruteKept=${brute.size} ivfKept=${ivf.size} subset=${brute.subsetOf(ivf)}")
    }
    spark.stop()
  }
}
