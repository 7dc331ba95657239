package graft.bio

import org.apache.spark.sql.SparkSession

/** Microbenchmark for the flagship scan (dev tool, not part of the driver
  * surface): times one chunk single-threaded, the raw kernel loop, and the
  * distributed scan — `runMain graft.bio.ScanBench`.
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val genome = {
      val sb = new java.lang.StringBuilder(1000000)
      var i = 0
      while (i < 1000000) { sb.append("acgt".charAt(rnd.nextInt(4))); i += 1 }
      sb.toString
    }
    val genes = Seq(
      "bench_g1" -> (0 until 30).map(_ => "acgt"(rnd.nextInt(4))).mkString,
      "bench_g2" -> (0 until 30).map(_ => "acgt"(rnd.nextInt(4))).mkString)
    val cfg = ScanConfig(weights = Map("consistency" -> 1.0), topK = 1000,
      candidateDistance = 5, patience = 2, numChunks = 64)

    GenomeScan.scanChunk(genes.head._2, genome, isReverse = false, 0, 100000, cfg) // warmup
    var t0 = System.nanoTime()
    val r = GenomeScan.scanChunk(genes.head._2, genome, isReverse = false, 0, genome.length, cfg)
    println(s"single-thread scanChunk 1Mbp: ${(System.nanoTime() - t0) / 1e9}s survivors=${r.size}")

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    for (i <- 1 to 3) {
      t0 = System.nanoTime()
      val n = GenomeScan.scan(spark, genome, genes, cfg).count()
      println(s"distributed scan run $i (2 genes x 2 strands x 1Mbp): ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    }
    spark.stop()
  }
}
