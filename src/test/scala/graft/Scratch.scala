package graft

/** Dev-only micro-measurement (not part of the engine surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val n = 2000000
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) { sb.append("acgt".charAt(rnd.nextInt(4))); i += 1 }
    val genome = sb.toString
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val db = genome.getBytes(iso)
    val gene = (0 until 30).map(_ => "acgt"(rnd.nextInt(4))).mkString.getBytes(iso)
    val runLen = new Array[Int](31)
    val runEnd = new Array[Int](31)

    def time(label: String)(f: => Double): Unit = {
      val secs = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        val t = (System.nanoTime() - t0) / 1e9
        if (r == Double.MinValue) println("impossible")
        t
      }
      println(f"TIME $label best ${secs.min}%.3f s  (${(n / secs.min / 1e6)}%.1f Mbp/s)")
    }

    // kernel only
    time("kernel_only") {
      var acc = 0.0
      var off = 0
      val last = db.length - gene.length
      while (off < last) {
        acc += graft.bio.SimilarityKernels.consistencyScoreOnlyB(gene, db, off, 2, runLen, runEnd)
        off += 1
      }
      acc
    }

    // full chunk loop (kernel + deque + heap)
    val cfg = graft.bio.ScanConfig(
      weights = Map("consistency" -> 1.0), topK = 1000,
      candidateDistance = 5, patience = 2, numChunks = 1)
    time("full_chunk") {
      graft.bio.GenomeScan.scanChunkSlimBytes(gene, db, isReverse = false, 0, db.length, cfg)
        .headOption.map(_._1).getOrElse(0.0)
    }
  }
}
