package graft.bio

import org.scalatest.funsuite.AnyFunSuite

/** Golden values ported from the reference's unit tests
  * (`src/unittest/test_similarity_match.py`) plus constructed cases for the
  * kernels the reference left untested. The reference's stale test API
  * scaled scores to percent (`int(score*100/len)`) — both raw and scaled
  * forms are asserted.
  */
class KernelGoldenSpec extends AnyFunSuite {
  import SimilarityKernels._

  // ---- X2 text_edit (test_similarity_match.py:8-12)

  test("text_edit golden: ACGTACG vs ACGACGT = 71 scaled (dist 2, score 5)") {
    val score = textEditScore("ACGTACG", "ACGACGT", 0)
    assert(score === 5.0)
    assert((score * 100).toInt / 7 === 71)
  }

  test("text_edit offset invariance (same window at offset 3)") {
    assert(textEditScore("ACGTACG", "GCTACGACGT", 3) === textEditScore("ACGTACG", "ACGACGT", 0))
  }

  test("text_edit wobble: lowercase c matches t one-directionally") {
    assert(textEditScore("cc", "tt", 0) === 2.0) // query c ≈ subject t
    assert(textEditScore("tt", "cc", 0) === 0.0) // NOT symmetric
  }

  test("text_edit continuous mismatch limit zeroes the score") {
    // aaaa vs tttt: 4 consecutive substitution mismatches
    assert(textEditScore("aaaa", "ttttaaaa", 0) === 0.0)
    assert(textEditScore("aaaa", "ttttaaaa", 0, continuousMismatchLimit = 2) === 0.0)
    // one mismatch inside matches: run of 1 < limit 2 survives
    assert(textEditScore("aaaa", "aata", 0, continuousMismatchLimit = 2) === 3.0)
    // window "aatt": 2-substitution run hits the limit exactly → zeroed
    assert(textEditScore("aaaa", "aatta", 0) === 2.0)
    assert(textEditScore("aaaa", "aatta", 0, continuousMismatchLimit = 2) === 0.0)
  }

  // ---- X1 direct (test_similarity_match.py:13-14)

  test("direct golden: ACGTACG vs ACGACGT = 42 scaled (3 positional matches)") {
    val score = directScore("ACGTACG", "ACGACGT", 0)
    assert(score === 3.0)
    assert((score * 100).toInt / 7 === 42)
  }

  test("direct render marks") {
    val r = directRender("ACGTACG", "ACGACGT", 0)
    assert(r.gene === "ACGTACG")
    assert(r.target === "ACGACGT")
    assert(r.marks === "***....")
  }

  // ---- X5 blat truth table (test_similarity_match.py:28-41)

  test("blat truth table") {
    val gene = "tgatatca"
    val cases = Seq(
      ("atgatatca", 0, false, None),
      ("tgatatca", 0, false, None),
      ("tgataatca", 0, true, Some(9)),
      ("tagataatca", 0, true, Some(10)),
      ("tagtactaatca", 0, false, None),
      ("taaaagataatca", 0, true, Some(13)))
    for ((db, offset, expectFlag, expectPos) <- cases) {
      val (flag, pos) = blatSimilarity(gene, db, offset)
      assert(flag === expectFlag, s"flag for $db")
      assert(pos === expectPos, s"pos for $db")
    }
  }

  // ---- X8 fast_skip truth table (test_similarity_match.py:16-26)

  test("fast_skip truth table") {
    val counts = countBases("AAAATTTAA")
    def pat(p: String) = Some(java.util.regex.Pattern.compile(p))
    assert(!fastSkip(counts, 9, "AAATTTTGG", 0, 3, None))
    assert(fastSkip(counts, 9, "AAATTTTGG", 0, 7, None))
    assert(!fastSkip(counts, 9, "AAATTTTGG", 0, 3, pat(".*AA.*GG.*")))
    assert(fastSkip(counts, 9, "AAATTTTGG", 0, 3, pat(".*AA.*AA")))
  }

  // ---- X3 consistency (constructed; reference has no unit test)

  test("consistency: patience bridges a 1-mismatch gap") {
    // runs: [(2,2),(1,4)]; patience 1 merges them: score 3
    val r = consistencyScore("aaaa", "aata", 0, maxPatience = 1)
    assert(r.score === 3.0)
    assert(r.runs === Vector((2, 2), (1, 4)))
    assert(r.mergeIdx === ((0, 1)))
  }

  test("consistency: patience 0 does not bridge") {
    val r = consistencyScore("aaaa", "aata", 0, maxPatience = 0)
    assert(r.score === 2.0)
  }

  test("consistency render marks bridged gap with '-'") {
    val r = consistencyRender("aaaa", "aata", 0, maxPatience = 1)
    assert(r.marks === "**-*")
  }

  test("consistency on perfect match = full length") {
    val r = consistencyScore("acgt", "acgt", 0, maxPatience = 2)
    assert(r.score === 4.0)
    assert(r.runs === Vector((4, 4)))
  }

  // ---- X4 pattern (constructed from 1-run_gene_similarity_match.py:27-42 shape)

  test("pattern: must conditions anchor and score; optional adds") {
    // rna = "acgtacgt"; must = first 3 bases; optional = last 2 bases
    val p = MatchPattern("acgtacgt",
      must = Seq(PatternCondition(0, 3)),
      optional = Seq(PatternCondition(-2, 2)))
    // window matching must only: acg + filler (gap regex .+ needs ≥1 char)
    assert(p.score("acgxxxxx") === 3)
    // window matching must and optional (optional window 'gt' at end)
    assert(p.score("acgxxxgt") === 5)
    // must not matching
    assert(p.score("tcgxxxgt") === 0)
  }

  test("pattern: c degenerates to (c|t)") {
    val p = MatchPattern("ccc", must = Seq(PatternCondition(0, 3)), optional = Nil)
    assert(p.score("ttt") === 3)
    assert(p.score("ctc") === 3)
    assert(p.score("gtt") === 0)
  }

  // ---- X7 blend

  test("blend: weighted average over enabled kernels, zero weights dropped") {
    val (w, scores) = blendedScore(
      Map("direct" -> 1.0, "consistency" -> 3.0, "text_edit" -> 0.0),
      "aaaa", "aata", 0, KernelConfig(maxPatience = 1))
    assert(scores.keySet === Set("direct", "consistency"))
    assert(scores("direct") === 3.0)
    assert(scores("consistency") === 3.0)
    assert(w === 3.0)
  }

  // ---- W1 column-wise best window

  test("bestDirectWindow: argmax over all offsets, ties to lowest, wobble applies") {
    // probe 'acg': windows of 'ttacgtacg' score 0,1,3,... best at off 3 (1-based)
    assert(bestDirectWindow("acg", "ttacgtacg") === ((3, 3.0)))
    // tie: two perfect windows -> the earlier one wins
    assert(bestDirectWindow("aa", "aaxaa") === ((1, 2.0)))
    // wobble: probe 'c' matches subject 't'
    assert(bestDirectWindow("cc", "ggtt") === ((3, 2.0)))
    // brute-force cross-check on a pseudo-random string
    val rnd = new scala.util.Random(3)
    val txt = Seq.fill(60)("acgt"(rnd.nextInt(4))).mkString
    val probe = "acgtac"
    val brute = (0 to txt.length - probe.length).map { o =>
      (o + 1, directScore(probe, txt, o))
    }.maxBy { case (o, s) => (s, -o) }
    assert(bestDirectWindow(probe, txt) === brute)
  }

  test("blatSweep counts exactly the offsets where the DFS matches") {
    val rnd = new scala.util.Random(9)
    val dna = Seq.fill(200)("acgt"(rnd.nextInt(4))).mkString
    val gene = "gattacca"
    val (hits, firstEnd) = blatSweep(gene, dna)
    val last = dna.length - gene.length - 10 - 2 - 2
    val expected = (0 to last).flatMap { o =>
      val (ok, end) = blatSimilarity(gene, dna, o)
      if (ok) Some(end.getOrElse(-1)) else None
    }
    assert(hits === expected.size.toLong)
    assert(firstEnd === expected.headOption.getOrElse(-1))
    assert(hits > 0, "fixture must produce at least one blat hit")
  }

  // ---- X6 text_edit render round-trip

  test("text_edit render tracks match the reference bit-for-bit") {
    // golden produced by running the reference's rendering_sequence:
    // gene 'ACGTACG.', target 'ACG.ACGT', marks '***.***.' (6 aligned
    // matches, 2 edit ops — alignment stars ≠ score)
    val r = textEditRender("ACGTACG", "ACGACGT", 0)
    assert(r.gene === "ACGTACG.")
    assert(r.target === "ACG.ACGT")
    assert(r.marks === "***.***.")
  }
}
