package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev probe (r13): IVF-PQ recall vs its two scale knobs at sf0.1, where
  * the gate config measured 0.36 (RECALL.json). The re-rank is ALREADY
  * exact (ivfPqTopK re-ranks the ADC top candidateFactor×k with true
  * cosines), so the recall loss is shortlist/probe coverage — this
  * measures which knob buys it back and at what candidate cost. Run:
  *   sbt -batch "Test/runMain graft.AnnPqTuneProbe"
  */
object AnnPqTuneProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.embeddings(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs(graft.ann.Ann.cosineTopK(emb, "vec_id", "embedding",
      col("vec_id") < 20, k = 5))
    println(s"[pq-tune] brute pairs: ${brute.size}")

    // gate config: numCells=16, nProbe=4, m=8, ks=16, candidateFactor=8
    val grid = Seq(
      ("gate cf=8 nProbe=4", 4, 8),
      ("cf=32 nProbe=4", 4, 32),
      ("cf=8 nProbe=8", 8, 8),
      ("cf=32 nProbe=8", 8, 32),
      ("cf=64 nProbe=16", 16, 64))
    grid.foreach { case (label, np, cf) =>
      val t0 = System.nanoTime()
      val got = pairs(graft.ann.Ann.ivfPqTopK(emb, "vec_id", "embedding",
        col("vec_id") < 20, k = 5, nProbe = np, candidateFactor = cf))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (brute intersect got).size.toDouble / brute.size
      println(f"[pq-tune] $label%-20s recall=$recall%.2f  wall=$sec%.1f s")
    }
    spark.stop()
  }
}
