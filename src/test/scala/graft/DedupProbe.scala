package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage timing of the jaccard pair pipeline (not a test). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val r = f
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"$name min=${ts.map(_._1).min}%.3f rows=${ts.head._2} all=${ts.map(t => f"${t._1}%.2f").mkString(",")}")
    }

    def docs = Tables.documents(spark, d)
    def hashed = graft.text.Dedup.hashedShingleDocs(docs, "doc_id", "text")

    time("docs_scan") { docs.count() }
    time("hashed_shingles") { hashed.count() }
    time("postings_explode") { hashed.select(col("doc_id"), explode(col("hs"))).count() }
    time("pairs_full") { graft.text.Dedup.jaccardPairsHashed(hashed, 0.5).count() }
    time("components") {
      graft.text.Dedup.connectedComponents(
        graft.text.Dedup.jaccardPairsHashed(hashed, 0.5)).count()
    }
    spark.stop()
  }
}
