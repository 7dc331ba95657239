package graft.bio

import org.scalatest.funsuite.AnyFunSuite

/** Proves the identity the `x3_consistency_text` DuckDB oracle relies on:
  * the consistency kernel's best patience-bridged run score equals the
  * maximum number of matches over ANY window [i,j] containing at most
  * `patience` mismatches.
  *
  * Why it holds: runs are maximal, so every gap between merged runs has
  * >= 1 mismatch; a span with total mismatches <= p therefore crosses
  * <= p gaps, which is exactly the kernel's width bound — and any window
  * can be trimmed to start/end on matches without changing its match
  * count or increasing its mismatch count.
  */
class ConsistencyIdentitySpec extends AnyFunSuite {

  /** Brute-force interval max over the equality match mask. */
  private def intervalMax(gene: String, db: String, patience: Int): Int = {
    val n = gene.length
    val mask = Array.tabulate(n)(i => gene.charAt(i) == db.charAt(i))
    var best = 0
    for (i <- 0 until n; j <- i until n) {
      var matches = 0
      var mism = 0
      for (k <- i to j) if (mask(k)) matches += 1 else mism += 1
      if (mism <= patience && matches > best) best = matches
    }
    best
  }

  test("consistencyScore == interval-max over random masks, patience 0..3") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 2000) {
      val n = 1 + rnd.nextInt(25)
      // alphabet {a,g} — no 'c' in the gene, so wobble can't fire and the
      // match rule is plain equality, matching the oracle's mask
      val gene = Seq.fill(n)(if (rnd.nextBoolean()) 'a' else 'g').mkString
      val db = Seq.fill(n)(if (rnd.nextBoolean()) 'a' else 'g').mkString
      val patience = rnd.nextInt(4)
      val kernel = SimilarityKernels.consistencyScore(gene, db, 0, patience).score.toInt
      val brute = intervalMax(gene, db, patience)
      assert(kernel === brute,
        s"trial $trial: gene=$gene db=$db patience=$patience kernel=$kernel brute=$brute")
    }
  }

  test("scratch-array consistencyScoreOnly agrees on the same masks") {
    val rnd = new scala.util.Random(7)
    val runLen = new Array[Int](64)
    val runEnd = new Array[Int](64)
    for (_ <- 0 until 500) {
      val n = 1 + rnd.nextInt(25)
      val gene = Seq.fill(n)(if (rnd.nextBoolean()) 'a' else 'g').mkString
      val db = Seq.fill(n)(if (rnd.nextBoolean()) 'a' else 'g').mkString
      val patience = rnd.nextInt(4)
      val a = SimilarityKernels.consistencyScore(gene, db, 0, patience).score
      val b = SimilarityKernels.consistencyScoreOnly(gene, db, 0, patience, runLen, runEnd)
      assert(a === b)
    }
  }
}
