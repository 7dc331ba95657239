package graft.bio

import graft.SparkSpec

/** W1 end-to-end scan on a synthetic genome: a planted motif must surface as
  * the top hit on the correct strand with the reference's coordinate algebra.
  */
class GenomeScanSpec extends SparkSpec {

  private val rnd = new scala.util.Random(11)
  private def randomDna(n: Int): String = List.fill(n)("acgt"(rnd.nextInt(4))).mkString

  test("planted forward motif is the top hit with exact coordinates") {
    val motif = "acgtacgtacgtacgtttcc" // 20 bp
    val pos = 1234                     // 0-based plant position
    val genome = randomDna(pos) + motif + randomDna(3000 - pos - motif.length)
    val cfg = ScanConfig(weights = Map("consistency" -> 1.0), topK = 5,
      candidateDistance = 5, patience = 2, numChunks = 4)
    val hits = GenomeScan.scan(spark, genome, Seq("m1" -> motif), cfg).collect()

    assert(hits.nonEmpty)
    val best = hits.maxBy(_.weightedSimilarity)
    assert(best.weightedSimilarity === motif.length.toDouble)
    assert(!best.isReverse)
    assert(best.start === pos + 1)            // 1-based inclusive
    assert(best.end === pos + motif.length)
    assert(hits.length <= 2 * cfg.topK)       // ≤ topK per gene (both strands merged)
  }

  test("planted reverse-complement motif surfaces with start>end") {
    val motif = "aacgtgcatgcatgggtcaa"
    val pos = 2000
    val rc = Dna.reverseComplement(motif)
    val genome = randomDna(pos) + rc + randomDna(3000 - pos - rc.length)
    val cfg = ScanConfig(weights = Map("consistency" -> 1.0), topK = 3,
      candidateDistance = 5, patience = 2, numChunks = 4)
    val hits = GenomeScan.scan(spark, genome, Seq("m2" -> motif), cfg).collect()

    val best = hits.maxBy(_.weightedSimilarity)
    assert(best.weightedSimilarity === motif.length.toDouble)
    assert(best.isReverse)
    assert(best.start > best.end)
    // reverse coords: start = N - left maps back to the forward plant site:
    // the motif's revcomp occupies [pos+1, pos+len] forward; a reverse-strand
    // hit over it reports start = pos+len, end = pos+1 (1-based, swapped).
    assert(best.start === pos + motif.length)
    assert(best.end === pos + 1)
  }

  test("top-k bound and per-gene grouping hold for multiple genes") {
    val genome = randomDna(2000)
    val genes = Seq("g1" -> randomDna(15), "g2" -> randomDna(15))
    val cfg = ScanConfig(weights = Map("direct" -> 1.0), topK = 7,
      candidateDistance = 3, numChunks = 3)
    val hits = GenomeScan.scan(spark, genome, genes, cfg).collect()
    val byGene = hits.groupBy(_.name)
    assert(byGene.keySet === Set("g1", "g2"))
    byGene.values.foreach(hs => assert(hs.length === 7))
  }

  test("ascending mode surfaces the WORST matches") {
    val genome = randomDna(1500)
    val gene = randomDna(12)
    val asc = ScanConfig(weights = Map("direct" -> 1.0), topK = 5,
      candidateDistance = 3, ascending = true, numChunks = 2)
    val desc = asc.copy(ascending = false)
    val ah = GenomeScan.scan(spark, genome, Seq("g" -> gene), asc).collect()
    val dh = GenomeScan.scan(spark, genome, Seq("g" -> gene), desc).collect()
    assert(ah.nonEmpty && dh.nonEmpty)
    // ascending surfaces low scores, reported un-negated
    assert(ah.forall(_.weightedSimilarity >= 0))
    assert(ah.map(_.weightedSimilarity).max < dh.map(_.weightedSimilarity).min)
  }

  test("fast scanChunk equals the object-based suppression + topK path") {
    val genome = randomDna(3000)
    for (kernel <- Seq("direct", "consistency", "text_edit"); ascending <- Seq(false, true)) {
      val gene = randomDna(14)
      val cfg = ScanConfig(weights = Map(kernel -> 1.0), topK = 50,
        candidateDistance = 4, patience = 2, ascending = ascending, numChunks = 1)
      val fast = GenomeScan.scanChunk(gene, genome, isReverse = false, 0, genome.length, cfg)
        .map(c => (c.left, c.weightedSimilarity))
      val kcfg = SimilarityKernels.KernelConfig(maxPatience = cfg.patience)
      val raw = Iterator.range(0, genome.length - gene.length + 1).map { off =>
        val (b, s) = SimilarityKernels.blendedScore(cfg.weights, gene, genome, off, kcfg)
        MatchCandidate(off, off + gene.length - 1, false, genome.length,
          if (ascending) -b else b, s)
      }
      val slow = Suppression.topK(
        Suppression.suppress(raw, cfg.candidateDistance, dropNonPositive = !ascending),
        cfg.topK).map(c => (c.left, c.weightedSimilarity))
      assert(fast === slow, s"kernel=$kernel ascending=$ascending")
    }
  }

  test("scanGenomes: per-genome results equal single-genome scans") {
    import spark.implicits._
    val g1 = randomDna(1200)
    val g2 = randomDna(900)
    val genes = Seq("m" -> randomDna(12))
    val cfg = ScanConfig(weights = Map("consistency" -> 1.0), topK = 8,
      candidateDistance = 4, patience = 1, numChunks = 3)
    val multi = GenomeScan.scanGenomes(Seq(("a", g1), ("b", g2)).toDS(), genes, cfg)
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val singleA = GenomeScan.scan(spark, g1, genes, cfg).collect().toSet
    val singleB = GenomeScan.scan(spark, g2, genes, cfg).collect().toSet
    assert(multi("a") === singleA)
    assert(multi("b") === singleB)
  }

  test("byte fast path == String path, survivor-for-survivor, all configs") {
    val genome = randomDna(20000)
    val gene = randomDna(25)
    val bytes = (s: String) => s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val configs = Seq(
      ScanConfig(weights = Map("consistency" -> 1.0), topK = 50,
        candidateDistance = 5, patience = 2, numChunks = 4),
      ScanConfig(weights = Map("direct" -> 2.0, "text_edit" -> 1.0), topK = 30,
        candidateDistance = 3, numChunks = 4),
      ScanConfig(weights = Map("consistency" -> 1.0, "direct" -> 0.5), topK = 20,
        candidateDistance = 5, patience = 1, ascending = true, numChunks = 4))
    configs.foreach { cfg =>
      assert(GenomeScan.byteEligible(cfg))
      GenomeScan.chunks(genome.length, cfg.numChunks).foreach { case (s, e) =>
        val viaString = GenomeScan.scanChunkSlim(gene, genome, isReverse = false, s, e, cfg)
        val viaBytes = GenomeScan.scanChunkSlimBytes(
          bytes(gene), bytes(genome), isReverse = false, s, e, cfg)
        assert(viaBytes === viaString, s"chunk ($s,$e) cfg=$cfg")
      }
    }
    // pattern / blat / mismatch-limit configs must NOT claim the byte path
    assert(!GenomeScan.byteEligible(ScanConfig(weights = Map("blat" -> 1.0))))
    assert(!GenomeScan.byteEligible(
      ScanConfig(weights = Map("text_edit" -> 1.0), continuousMismatchLimit = 3)))
  }

  test("branchless consistency kernel == run-based == String port, every offset") {
    val db = randomDna(3000)
    val dbB = db.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    for (geneLen <- Seq(1, 8, 30, 64, 70); patience <- 0 to 3) {
      val gene = randomDna(geneLen)
      val geneB = gene.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val runLen = new Array[Int](geneLen + 1)
      val runEnd = new Array[Int](geneLen + 1)
      var off = 0
      while (off <= db.length - geneLen) {
        val branchless = SimilarityKernels.consistencyScoreOnlyB(
          geneB, dbB, off, patience, runLen, runEnd)
        val runs = SimilarityKernels.consistencyScoreOnlyRunsB(
          geneB, dbB, off, patience, runLen, runEnd)
        val str = SimilarityKernels.consistencyScoreOnly(
          gene, db, off, patience, runLen, runEnd)
        assert(branchless === runs, s"len=$geneLen patience=$patience off=$off")
        assert(branchless === str, s"len=$geneLen patience=$patience off=$off")
        off += 1
      }
    }
  }

  test("branchless kernel handles non-ASCII bytes (sign-extension regression)") {
    // bytes >= 0x80 sign-extend negative in Scala; the arithmetic equality
    // trick needs the & 0xFF mask or exactly one negative operand reports
    // a FALSE MATCH — pin byte==run==String parity on 8-bit-heavy input
    val rnd = new scala.util.Random(23)
    val alphabet = "acgtéÿz"  // DNA + latin-1 high bytes
    def randomSeq(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val db = randomSeq(800)
    val dbB = db.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    for (geneLen <- Seq(8, 30, 64); patience <- 0 to 2) {
      val gene = randomSeq(geneLen)
      val geneB = gene.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      val runLen = new Array[Int](geneLen + 1)
      val runEnd = new Array[Int](geneLen + 1)
      var off = 0
      while (off <= db.length - geneLen) {
        val branchless = SimilarityKernels.consistencyScoreOnlyB(
          geneB, dbB, off, patience, runLen, runEnd)
        val str = SimilarityKernels.consistencyScoreOnly(
          gene, db, off, patience, runLen, runEnd)
        assert(branchless === str, s"len=$geneLen patience=$patience off=$off")
        off += 1
      }
    }
  }

  test("chunks replicate the reference next_interval split") {
    assert(GenomeScan.chunks(100, 4) === Seq((0, 25), (25, 50), (50, 75), (75, 100)))
    // remainder spills into an extra short chunk (size // n division)
    assert(GenomeScan.chunks(10, 3) === Seq((0, 3), (3, 6), (6, 9), (9, 10)))
    // degenerate: size smaller than chunk count
    assert(GenomeScan.chunks(2, 32) === Seq((0, 1), (1, 2)))
  }
}
