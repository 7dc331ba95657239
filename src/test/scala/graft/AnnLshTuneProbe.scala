package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** One-off recall sweep over plain-LSH (bits, tables) configs vs the
  * brute-force truth at sf0.01 (dev probe, not a test) — the measurement
  * behind the r12 LSH re-tuning decision.
  */
object AnnLshTuneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.embeddings(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .as[(Long, Long)].collect().toSet
    val brute = pairs(graft.ann.Ann.cosineTopK(emb, "vec_id", "embedding",
      col("vec_id") < 20, 5))
    for ((bits, tables) <- Seq((8, 8), (8, 16), (6, 8), (6, 16), (5, 16), (4, 16), (4, 24))) {
      val t0 = System.nanoTime()
      val got = pairs(graft.ann.Ann.lshTopK(emb, "vec_id", "embedding",
        col("vec_id") < 20, 5, dim = 64, numPlanes = bits, tables = tables))
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (brute intersect got).size.toDouble / brute.size
      // candidate volume BEFORE exact scoring, for the full self-join
      // workload (every vector as query): the scale-direction number —
      // recall bought by wider buckets is recall bought with candidates
      import org.apache.spark.sql.functions.{array, explode, lit, struct}
      val sigs = array((0 until tables).map { t =>
        struct(lit(t).as("t"),
          graft.ann.Ann.hyperplaneSignature(col("embedding"), 64, bits,
            t * bits).as("sig"))
      }: _*)
      val cells = emb.select(col("vec_id").as("id"), explode(sigs).as("cell"))
      val allCands = cells.as("a")
        .join(cells.as("b"), col("a.cell") === col("b.cell"))
        .where(col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).distinct().count()
      println(f"bits=$bits%2d tables=$tables%2d recall=$recall%.3f " +
        f"selfjoin_cands=$allCands%8d $sec%5.1fs")
    }
    spark.stop()
  }
}
