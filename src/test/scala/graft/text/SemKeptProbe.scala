package graft.text

import org.apache.spark.sql.functions._

/** Dev-only probe: kept-embedding counts behind the cur_semantic sf1 row. */
object SemKeptProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", 16)
      .appName("sem-kept").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/sf1")) {
      val kept = graft.Tables.documents(spark, d).select(
          col("doc_id"),
          TextOps.qualityScore(col("text"), TextQueries.qualityStopwords).as("q"))
        .where(col("q") >= 0.4)
      val nEmb = graft.Tables.embeddings(spark, d).count()
      val keptEmb = graft.Tables.embeddings(spark, d)
        .join(kept.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
        .count()
      println(s"RESULT dir=$d docs_kept=${kept.count()} embeddings=$nEmb kept_embeddings=$keptEmb")
    }
    spark.stop()
  }
}
