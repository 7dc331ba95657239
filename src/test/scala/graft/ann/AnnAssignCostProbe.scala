package graft.ann

import org.apache.spark.sql.functions._

/** Dev-only probe (r18, verdict ask #6): the routed layer's assignment
  * pass is linear in `numCells` (one centroid dot per cell per corpus
  * vector), and the scaladoc names ~10k cells as the point to add a
  * second quantizer level. This probe turns that advice into numbers at
  * the 100× bracket (2M×64 vectors, /tmp/sf100): wall seconds for one
  * full-corpus assignment pass at widening cell counts, next to the
  * bounded trainer's own cost. The decision rule it feeds: a second
  * level pays off when the assignment pass rivals the graph-build
  * minutes — i.e. when numCells × dim flops/row approaches the build's
  * ef×m-scale flops/row — and the measured rows land in ARCHITECTURE.
  *
  * Env: SPARK_GRAFT_SF100_DIR (default /tmp/sf100),
  * SPARK_GRAFT_ASSIGN_CELLS (comma list, default 128,1024,4096,10240),
  * SPARK_GRAFT_ASSIGN_TWOLEVEL (SxC arms for the r18.5 two-level
  * quantizer at the same flat-equivalent cell counts, default
  * 64x64,32x320,128x80 — the last two sit AT the flat 10240-cell cliff
  * and should read ~2 orders cheaper: ~S+C dots/row vs S×C).
  */
object AnnAssignCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .appName("assign-cost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "/tmp/sf100")
    val cellArms = sys.env.getOrElse("SPARK_GRAFT_ASSIGN_CELLS",
      "128,1024,4096,10240").split(",").map(_.trim).filter(_.nonEmpty)
      .map(_.toInt).toSeq
    val emb = graft.Tables.embeddings(spark, d)
    val n = emb.count()
    println(s"ASSIGN corpus rows=$n dir=$d")
    for (cells <- cellArms) {
      val t0 = System.nanoTime()
      val cents = Ann.trainIvfCentroids(emb, "vec_id", "embedding",
        numCells = cells)
      val trainSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      Ann.assignCells(emb, "vec_id", "embedding", cents)
        .write.format("noop").mode("overwrite").save()
      val assignSec = (System.nanoTime() - t1) / 1e9
      println(f"ASSIGN cells=$cells train_sec=$trainSec%.2f " +
        f"assign_sec=$assignSec%.2f")
      spark.catalog.clearCache(); System.gc()
    }
    val twoArms = sys.env.getOrElse("SPARK_GRAFT_ASSIGN_TWOLEVEL",
      "64x64,32x320,128x80").split(",").map(_.trim).filter(_.nonEmpty)
      .map { a =>
        val Array(s, c) = a.split("x"); (s.toInt, c.toInt)
      }.toSeq
    for ((s, c) <- twoArms) {
      val t0 = System.nanoTime()
      val q = Ann.trainIvfCentroidsTwoLevel(emb, "vec_id", "embedding",
        numSuper = s, cellsPerSuper = c, nProbeSuper = math.max(1, s / 2))
      val trainSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      Ann.assignCellsTwoLevel(emb, "vec_id", "embedding", q)
        .write.format("noop").mode("overwrite").save()
      val assignSec = (System.nanoTime() - t1) / 1e9
      println(f"ASSIGN2 super=$s cells_per=$c flat_equiv=${s * c} " +
        f"train_sec=$trainSec%.2f assign_sec=$assignSec%.2f")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
