package graft.bio

import org.scalatest.funsuite.AnyFunSuite

/** T1 suppression semantics, traced by hand from the reference's
  * `update_candidate_list` (`gene_similarity_match.py:259-277`) — the rules
  * are order-dependent and asymmetric (SURVEY §7.4 risk 1), so every quirk
  * gets its own case. Randomized cases use a fixed seed (deterministic CI).
  */
class SuppressionSpec extends AnyFunSuite {

  private def mc(left: Int, score: Double) =
    MatchCandidate(left, left + 7, isReverse = false, databaseLength = 1000, score)

  private def starts(cs: Seq[MatchCandidate], distance: Int): Seq[Int] =
    Suppression.suppress(cs.iterator, distance).map(_.left).toSeq

  test("strictly better neighbor within distance suppresses") {
    // scores 1,2,3,2,4 at consecutive offsets, distance 3 → only the 4 survives
    val cs = Seq(mc(0, 1), mc(1, 2), mc(2, 3), mc(3, 2), mc(4, 4))
    assert(starts(cs, 3) === Seq(4))
  }

  test("equal scores coexist") {
    val cs = Seq(mc(0, 2), mc(1, 2))
    assert(starts(cs, 5) === Seq(0, 1))
  }

  test("non-positive scores are dropped") {
    val cs = Seq(mc(0, 0), mc(10, -1), mc(20, 5))
    assert(starts(cs, 3) === Seq(20))
  }

  test("suppressed candidate still suppresses later arrivals") {
    // 5 suppresses 4; the already-ignored 4 still suppresses the later 3
    val cs = Seq(mc(0, 5), mc(1, 4), mc(2, 3))
    assert(starts(cs, 5) === Seq(0))
  }

  test("candidates beyond the distance window do not interact") {
    val cs = Seq(mc(0, 1), mc(100, 5), mc(200, 3))
    assert(starts(cs, 5) === Seq(0, 100, 200))
  }

  test("emission preserves scan order") {
    val cs = Seq(mc(0, 7), mc(20, 9), mc(40, 8))
    assert(starts(cs, 5) === Seq(0, 20, 40))
  }

  test("suppression is a filter: survivors are a subsequence, max survives") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val scores = List.fill(60)(rnd.nextDouble() * 10)
      val dist = 1 + rnd.nextInt(10)
      val cs = scores.zipWithIndex.map { case (s, i) => mc(i, s) }
      val out = Suppression.suppress(cs.iterator, dist).toList
      val positions = out.map(_.left)
      assert(positions === positions.sorted)
      assert(out.toSet.subsetOf(cs.toSet))
      // the global max always survives (nothing can strictly beat it)
      assert(out.exists(_.weightedSimilarity == scores.max))
    }
  }

  test("topK keeps the k best with deterministic strand/position tiebreak") {
    val cs = Seq(mc(5, 3), mc(1, 9), mc(3, 9), mc(2, 1),
      MatchCandidate(2, 9, isReverse = true, 1000, 9.0))
    val got = Suppression.topK(cs.iterator, 3)
    assert(got.map(c => (c.left, c.isReverse)) === Seq((1, false), (3, false), (2, true)))
  }

  test("topK equals sort-take for random input") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val scores = List.fill(50)(rnd.nextInt(20).toDouble)
      val cs = scores.zipWithIndex.map { case (s, i) => mc(i, s) }
      val got = Suppression.topK(cs.iterator, 10)
      val want = cs.sortBy(c => (-c.weightedSimilarity, c.isReverse, c.left)).take(10)
      assert(got === want)
    }
  }

  test("coordinate algebra: forward 1-based, reverse start>end encodes strand") {
    val fwd = mc(10, 1.0) // left=10, right=17, N=1000
    assert(fwd.start === 11)
    assert(fwd.end === 18)
    val rev = MatchCandidate(10, 17, isReverse = true, 1000, 1.0)
    assert(rev.start === 990)
    assert(rev.end === 983)
    assert(rev.start > rev.end)
  }

  test("Dna.reverseComplement: parity quirk drops non-acgt; strict keeps") {
    assert(Dna.reverseComplement("acgt") === "acgt")
    assert(Dna.reverseComplement("aanntt") === "aatt")
    assert(Dna.reverseComplementStrict("aanntt") === "aanntt")
    // involution on clean strings
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 20) {
      val s = List.fill(30)("acgt"(rnd.nextInt(4))).mkString
      assert(Dna.reverseComplement(Dna.reverseComplement(s)) === s)
    }
  }
}
