package graft

/** Dev-only micro-measurement (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val rnd = new scala.util.Random(42)
    val n = 4641652
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) { sb.append("acgt".charAt(rnd.nextInt(4))); i += 1 }
    val genome = sb.toString
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val genes = (1 to 1).map(g =>
      s"bench_g$g" -> (0 until 30).map(_ => "acgt"(rnd.nextInt(4))).mkString)
    val cfg = graft.bio.ScanConfig(
      weights = Map("consistency" -> 1.0), topK = 1000,
      candidateDistance = 5, patience = 2, numChunks = 32)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 5).foreach { rep =>
      println(s"--- rep $rep")
      val rev = time("revcomp")(graft.bio.Dna.reverseComplement(genome))
      val fb = time("bcast_fwd")(spark.sparkContext.broadcast(genome.getBytes(iso)))
      val rb = time("bcast_rev")(spark.sparkContext.broadcast(rev.getBytes(iso)))
      val tasks = for {
        (name, gene) <- genes
        isReverse <- Seq(false, true)
        (s, e) <- graft.bio.GenomeScan.chunks(genome.length, cfg.numChunks)
      } yield (name, gene, isReverse, s, e)
      val cfgB = spark.sparkContext.broadcast(cfg)
      // trivial job over same task structure: pure scheduling + encoder cost
      time("noop_job") {
        spark.createDataset(spark.sparkContext.parallelize(tasks, 64))
          .flatMap { case (name, _, isReverse, s, e) => Iterator((name, isReverse, s + e, 0.0)) }
          .groupByKey(_._1).flatMapGroups { (k, it) => Iterator(it.size) }.count()
      }
      // map-only job: kernels without shuffle/reduce
      time("map_only") {
        spark.createDataset(spark.sparkContext.parallelize(tasks, 64))
          .map { case (_, gene, isReverse, s, e) =>
            graft.bio.GenomeScan.scanChunkSlimBytes(
              gene.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
              if (isReverse) rb.value else fb.value, isReverse, s, e, cfgB.value).size
          }.reduce(_ + _)
      }
      // full scan
      time("full_scan") {
        graft.bio.GenomeScan.scan(spark, genome, genes, cfg).count()
      }
      fb.destroy(); rb.destroy(); cfgB.destroy()
    }
    spark.stop()
  }
}
