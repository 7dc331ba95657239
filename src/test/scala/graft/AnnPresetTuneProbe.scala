package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** r15 (verdict ask #2): the measurement behind the lsh / mp-lsh / ivf
  * SHIPPED-DEFAULT presets — recall vs the brute truth at BOTH gate SFs,
  * plus the self-join candidate count (the scale-cost a preset buys its
  * recall with: recall bought by wider buckets is recall bought with
  * candidates). Dev probe, not a test; the chosen presets land as the
  * method defaults in Ann.scala and are tripwired in AnnRecallSpec.
  */
object AnnPresetTuneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      println(s"== $dir ==")
      val emb = Tables.embeddings(spark, dir)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
          .as[(Long, Long)].collect().toSet
      val brute = pairs(graft.ann.Ann.cosineTopK(emb, "vec_id", "embedding",
        col("vec_id") < 20, 5))

      def selfJoinCands(bits: Int, tables: Int): Long = {
        import org.apache.spark.sql.functions.{array, explode, lit, struct}
        val sigs = array((0 until tables).map { t =>
          struct(lit(t).as("t"),
            graft.ann.Ann.hyperplaneSignature(col("embedding"), 64, bits,
              t * bits).as("sig"))
        }: _*)
        val cells = emb.select(col("vec_id").as("id"), explode(sigs).as("cell"))
        cells.as("a").join(cells.as("b"), col("a.cell") === col("b.cell"))
          .where(col("a.id") < col("b.id"))
          .select(col("a.id"), col("b.id")).distinct().count()
      }

      for ((bits, tables) <- Seq((8, 8), (6, 16), (5, 16), (4, 16),
          (6, 24), (5, 24), (4, 24))) {
        val t0 = System.nanoTime()
        val plain = pairs(graft.ann.Ann.lshTopK(emb, "vec_id", "embedding",
          col("vec_id") < 20, 5, dim = 64, numPlanes = bits, tables = tables))
        val t1 = System.nanoTime()
        val mp = pairs(graft.ann.Ann.lshMultiProbeTopK(emb, "vec_id",
          "embedding", col("vec_id") < 20, 5, dim = 64,
          numPlanes = bits, tables = tables))
        val t2 = System.nanoTime()
        val rp = (brute intersect plain).size.toDouble / brute.size
        val rm = (brute intersect mp).size.toDouble / brute.size
        val cands = selfJoinCands(bits, tables)
        println(f"lsh   bits=$bits%2d tables=$tables%2d recall=$rp%.3f " +
          f"mp_recall=$rm%.3f selfjoin_cands=$cands%9d " +
          f"${(t1 - t0) / 1e9}%5.1fs/${(t2 - t1) / 1e9}%5.1fs")
      }

      for ((cells, nProbe) <- Seq((16, 4), (16, 8), (16, 12), (32, 8),
          (32, 16), (64, 16))) {
        val t0 = System.nanoTime()
        val got = pairs(graft.ann.Ann.ivfTopK(emb, "vec_id", "embedding",
          col("vec_id") < 20, 5, numCells = cells, nProbe = nProbe))
        val sec = (System.nanoTime() - t0) / 1e9
        val r = (brute intersect got).size.toDouble / brute.size
        // probed fraction = the share of the corpus each query scans,
        // assuming balanced cells — the scale-direction number for IVF
        println(f"ivf   cells=$cells%2d nProbe=$nProbe%2d recall=$r%.3f " +
          f"probe_frac=${nProbe.toDouble / cells}%.3f $sec%5.1fs")
      }
    }
    spark.stop()
  }
}
