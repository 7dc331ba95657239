package graft.bio

import org.scalatest.funsuite.AnyFunSuite

/** Cross-language differential goldens: 40 seeded random cases whose
  * expected values were produced by EXECUTING the reference kernels
  * (`DirectMatchSimilarity`, `TextEditSimilarity` with and without
  * `continuous_mismatch_limit=3`, `ConsistencySimilarity`) — not by
  * reading their code. Any divergence in wobble handling, DP tie-breaking,
  * backtrace mismatch counting, or run-merging shows up here.
  *
  * Tuple: (gene, db, offset, patience, direct, textEdit, textEditLimit3,
  * consistency).
  */
class KernelDifferentialSpec extends AnyFunSuite {
  import SimilarityKernels._

  private val cases: Seq[(String, String, Int, Int, Double, Double, Double, Double)] = Seq(
    ("aggcgtcgatgccgatcc", "acggatgataaccgatactcgaca", 6, 3, 7.0, 8.0, 0.0, 6.0),
    ("cgtcacgaccg", "gctgaaatatcagcataatgtcgacatc", 10, 1, 6.0, 6.0, 6.0, 5.0),
    ("ccgcaacatca", "tattcccaggctcccttga", 1, 3, 3.0, 4.0, 4.0, 2.0),
    ("cccggcagtag", "aacgagtgtgtggttagtacgcaaaacttcggcggt", 2, 4, 5.0, 6.0, 6.0, 4.0),
    ("gatccacgcgtcac", "agtgacatccggcgaaa", 1, 4, 7.0, 7.0, 0.0, 6.0),
    ("tacgctttagatgagttaggt", "gctaataacaagcatttatccgctctcccctacaaaagccgctgtt", 17, 1, 3.0, 7.0, 0.0, 1.0),
    ("taagcttattagctgtacctgcaga", "tgcgatgcgcacgaaccgccggacttttggattctaaaggtttatatcat", 4, 0, 3.0, 10.0, 0.0, 1.0),
    ("cgctcgggtagctagt", "cggcttatgcttcgtgctgaccaatcgacca", 3, 2, 7.0, 7.0, 0.0, 4.0),
    ("cggggtaattgcg", "cgacccgcggaaccac", 0, 0, 2.0, 3.0, 0.0, 2.0),
    ("tttacccta", "acaagcggcgcgtagcgtcc", 6, 0, 2.0, 2.0, 0.0, 1.0),
    ("cgccgggagtctaactcaa", "atcatatggcccatcgcagtgcgtgagttttattcagcccaccc", 5, 0, 4.0, 6.0, 0.0, 1.0),
    ("caagagat", "cgaaatagtaatctgtctctctgctat", 11, 0, 2.0, 2.0, 0.0, 1.0),
    ("gagacaatgtccgtacactc", "actacttgttgtacagtagatattcaaccttagtggttggtaccttag", 8, 4, 4.0, 9.0, 0.0, 2.0),
    ("tgggcgaattttctc", "cgtgttaagtacacgacagtccgggtcctaccctca", 14, 1, 3.0, 4.0, 0.0, 3.0),
    ("tgcgaacca", "agtggctatctcaccgaagcgctaggtgagagc", 0, 0, 4.0, 5.0, 5.0, 3.0),
    ("ccggttaaaagctgaacgcctctg", "tgcgctttgctactcaggtagtgtaggca", 0, 2, 7.0, 10.0, 0.0, 3.0),
    ("ccgtatagt", "ataacacgacccatcgtgaaggtagacggaggatttaa", 2, 4, 1.0, 1.0, 0.0, 1.0),
    ("atgagtagtagagactaggggat", "catgcaacgtattgaaaaaccacccggacatgatcgtctacttgtctg", 25, 4, 4.0, 8.0, 0.0, 3.0),
    ("ttaagagggcttg", "atggtagtgcgcccgagcctcgatgaattacgcgcgctcagaa", 29, 1, 3.0, 4.0, 0.0, 2.0),
    ("caacggaaagtctgttgtccatt", "gttaagggactttcaagtttccgtgatagactagcgcaaggctaggccgtc", 10, 4, 4.0, 10.0, 0.0, 2.0),
    ("gcataaacgtgggattcccgac", "ttaacagtactaaacataggagacaattcaat", 10, 0, 9.0, 11.0, 0.0, 3.0),
    ("ggcatgtatagcgactcat", "ggttggcaccggaccgtctgaaaatgatgacatgaagaccgctatccga", 24, 1, 7.0, 9.0, 0.0, 3.0),
    ("tccccatctccaatggcccttgtg", "aggcgcgtctacgccctagacgctgtagttctgtaaaag", 5, 0, 10.0, 13.0, 0.0, 4.0),
    ("atcaacctccggcaa", "ctgtccatgcttgcctgtgagcgaaa", 7, 2, 4.0, 6.0, 6.0, 2.0),
    ("aactttagacg", "ttcggtagagattccga", 2, 0, 5.0, 5.0, 0.0, 4.0),
    ("cgagaggtgataag", "aaattgctctgctgataagtcaagcagt", 1, 4, 0.0, 4.0, 0.0, 0.0),
    ("tttatcagcacgttattata", "tcatcctagtaaatggagcgggccagttagcgtcgcagatag", 7, 0, 5.0, 6.0, 0.0, 2.0),
    ("aacataacttgga", "tagaagtgctgcgtcgcgacgggggtgtgaatgtgccg", 15, 0, 2.0, 2.0, 0.0, 1.0),
    ("ttcctctga", "caatggtagttcgacgtgccctgagatata", 9, 0, 4.0, 5.0, 5.0, 3.0),
    ("tataag", "tttcccgtgcaactaacggaaccg", 18, 0, 2.0, 2.0, 0.0, 1.0),
    ("agagaaagttaaaatg", "gccgtgcaggcatagtattggcggg", 0, 1, 3.0, 5.0, 0.0, 2.0),
    ("catcgctatactggagtca", "taaatgtacgtgtttacgcaaacagcacaccctaat", 15, 2, 4.0, 7.0, 0.0, 2.0),
    ("acctcttcccggagaagt", "gaggaggcatgctcttaaggcagatgtacgctccccaa", 1, 3, 3.0, 6.0, 0.0, 1.0),
    ("agaaatct", "acctcttggggcgtcaattctttgtaatacgt", 20, 0, 1.0, 2.0, 0.0, 1.0),
    ("acccactgcatttgcttc", "cctgcaacaaagtgccctcaacggatacaagacct", 15, 0, 8.0, 8.0, 0.0, 4.0),
    ("gtttgatctgaaaaatacttgact", "agcatgatttccgttgataatgtgcgatgg", 6, 4, 9.0, 13.0, 0.0, 9.0),
    ("acagctgagagag", "atagaccgcgacttcaggga", 5, 1, 2.0, 5.0, 0.0, 1.0),
    ("ctgtgaaggtcgcgtgttcagtata", "ggctgcaggttaagatgttcagcaagggat", 1, 0, 11.0, 15.0, 0.0, 7.0),
    ("acttcgttacg", "cagccagatgatgtaattaagttcagatgcagcctgcga", 3, 2, 1.0, 4.0, 0.0, 1.0),
    ("aaaatcct", "cggttatatgtatagggctaacacggtactactcat", 6, 3, 3.0, 3.0, 3.0, 3.0))

  test("direct kernel matches reference on 40 random cases") {
    for ((g, db, off, _, want, _, _, _) <- cases)
      assert(directScore(g, db, off) === want, s"direct($g, $db, $off)")
  }

  test("text_edit kernel matches reference on 40 random cases") {
    for ((g, db, off, _, _, want, _, _) <- cases)
      assert(textEditScore(g, db, off) === want, s"text_edit($g, $db, $off)")
  }

  test("text_edit with continuous_mismatch_limit=3 matches reference") {
    for ((g, db, off, _, _, _, want, _) <- cases)
      assert(textEditScore(g, db, off, continuousMismatchLimit = 3) === want,
        s"text_edit_limit3($g, $db, $off)")
  }

  test("consistency kernel matches reference on 40 random cases") {
    for ((g, db, off, patience, _, _, _, want) <- cases)
      assert(consistencyScore(g, db, off, patience).score === want,
        s"consistency($g, $db, $off, patience=$patience)")
  }
}
