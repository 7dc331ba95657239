package graft

import org.apache.spark.sql.SparkSession

/** Scan-only micro-bench (dev tool): the flagship genome scan without the
  * 42-query suite in front of it, so scan-path changes can be A/B'd in
  * ~30 s runs. Prints one JSON line with each repetition's seconds.
  * Args: [genomeLen] [nGenes] [reps].
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val genomeLen = if (args.length > 0) args(0).toInt else 4641652
    val nGenes = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 3
    val chunksOverride = if (args.length > 3) Some(args(3).toInt) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rnd = new scala.util.Random(42)
    val sb = new java.lang.StringBuilder(genomeLen)
    var i = 0
    while (i < genomeLen) { sb.append("acgt".charAt(rnd.nextInt(4))); i += 1 }
    val genome = sb.toString
    val genes = (1 to nGenes).map(g =>
      s"bench_g$g" -> (0 until 30).map(_ => "acgt"(rnd.nextInt(4))).mkString)
    val cfg = graft.bio.ScanConfig(
      weights = Map("consistency" -> 1.0), topK = 1000,
      candidateDistance = 5, patience = 2,
      numChunks = chunksOverride.getOrElse(cpus.toInt))

    // single-thread kernel rate (no Spark): upper bound for per-core scan
    val gBytes = genome.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    def oneKernelPass(useBytes: Boolean): Double = {
      val t0 = System.nanoTime()
      genes.take(2).foreach { case (_, gene) =>
        if (useBytes)
          graft.bio.GenomeScan.scanChunkSlimBytes(
            gene.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1), gBytes,
            isReverse = false, 0, genomeLen, cfg)
        else
          graft.bio.GenomeScan.scanChunkSlim(gene, genome, isReverse = false, 0, genomeLen, cfg)
      }
      (System.nanoTime() - t0) / 1e9
    }
    val kb = 2L * genomeLen
    val strRate = (kb / (1 to 3).map(_ => oneKernelPass(false)).min).toLong
    val byteRate = (kb / (1 to 3).map(_ => oneKernelPass(true)).min).toLong
    println(s"""{"kernel_1thread_bp_per_sec":{"string":$strRate,"bytes":$byteRate}}""")

    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      graft.bio.GenomeScan.scan(spark, genome, genes, cfg).count()
      (System.nanoTime() - t0) / 1e9
    }
    val bp = 2L * nGenes * genomeLen
    println(s"""{"scan_secs":[${times.map(t => f"$t%.2f").mkString(",")}],""" +
      s""""best_bp_per_sec":${(bp / times.min).toLong}}""")
    spark.stop()
  }
}
