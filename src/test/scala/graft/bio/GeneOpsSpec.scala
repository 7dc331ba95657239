package graft.bio

import graft.SparkSpec
import graft.io.GeneSegment

/** GeneOps vs goldens produced by EXECUTING the reference's extract/flank/
  * check_gene on a fixed genome prefix — the ±1 reverse-range shim and the
  * up/down swap are the parts a clean-room rewrite gets wrong.
  */
class GeneOpsSpec extends SparkSpec {

  private val dna = "agcttttcattctgactgcaacgggcaatatgtctctgtgtggattaaaaaaagagtgtctgatagcagc"

  private def seg(gene: String, l: Int, r: Int): GeneSegment =
    GeneSegment(Some(gene), l, r, complement = false, None, None, Some(s"lt_$gene"),
      None, None, None, None, None, Map.empty)

  test("extractRange matches reference incl. the reverse ±1 shim") {
    val cases = Seq(
      (5, 12, "tttcatt"), (12, 5, "gaatgaa"),
      (1, 10, "agcttttca"), (10, 1, "atgaaaagc"),
      (30, 31, "a"), (31, 30, "a"))
    for ((a, b, want) <- cases)
      assert(GeneOps.extractRange(dna, a, b) === want, s"extract($a,$b)")
  }

  test("flanking matches reference incl. minus-strand up/down swap") {
    assert(GeneOps.flanking(dna, 10, 20, reverse = false, 5) ===
      (("ttctgactgca", "tttca", "acggg")))
    assert(GeneOps.flanking(dna, 10, 20, reverse = true, 5) ===
      (("tgcagtcagaa", "cccgt", "tgaaa")))
    assert(GeneOps.flanking(dna, 3, 8, reverse = false, 5) ===
      (("cttttc", "ag", "attct")))
    assert(GeneOps.flanking(dna, 60, 68, reverse = true, 5) ===
      (("tgctatcag", "gc", "acact")))
  }

  test("isBetterNextGene truth table from executed reference") {
    val cases = Seq(
      (100, 200, '+', 250, 300, None, true),
      (100, 200, '+', 150, 300, None, false),
      (100, 200, '+', 250, 300, Some((400, 500)), true),
      (100, 200, '+', 450, 500, Some((250, 300)), false),
      (200, 100, '-', 10, 50, None, true),
      (200, 100, '-', 10, 150, None, false),
      (200, 100, '-', 10, 50, Some((1, 5)), true),
      (200, 100, '-', 1, 5, Some((10, 50)), false))
    for ((hl, hr, d, gl, gr, t, want) <- cases)
      assert(GeneOps.isBetterNextGene(hl, hr, d, gl, gr, t) === want,
        s"checkGene($hl,$hr,$d,$gl,$gr,$t)")
  }

  test("pickNextGene folds candidates in order (closest downstream wins)") {
    val genes = Seq(("far", 400, 500), ("near", 250, 300), ("behind", 10, 50))
    assert(GeneOps.pickNextGene(100, 200, '+', genes).map(_._1) === Some("near"))
    val rev = Seq(("far", 1, 5), ("near", 10, 50), ("ahead", 250, 300))
    assert(GeneOps.pickNextGene(200, 100, '-', rev).map(_._1) === Some("near"))
    assert(GeneOps.pickNextGene(100, 200, '+', Seq(("behind", 10, 50))) === None)
  }

  test("neighborProbe: nearest flank selection keeps first among equals") {
    val segs = Seq(seg("a", 1, 10), seg("b", 15, 25), seg("c", 40, 50), seg("d", 60, 70))
    val (up, down, cover) = GeneOps.neighborProbe(segs, 30, 35)
    assert(up.flatMap(_.gene) === Some("b"))
    assert(down.flatMap(_.gene) === Some("c"))
    assert(cover.isEmpty)
    val (_, _, cov2) = GeneOps.neighborProbe(segs, 20, 45)
    assert(cov2.flatMap(_.gene) === Seq("b", "c"))
  }

  test("rangeRows emits regions between genes plus a trailing region") {
    val segs = Seq(seg("a", 5, 10), seg("b", 12, 20), seg("c", 18, 30))
    val rows = GeneOps.rangeRows(segs, 40)
    // 1-bp gap 11..11 DOES emit (condition is last_end < left-1, 10 < 11)
    assert(rows.map(_.name) ===
      Seq("region_1", "gene_1", "region_2", "gene_2", "gene_3", "region_3"))
    assert((rows.head.left, rows.head.right) === ((1, 4)))
    assert((rows(2).left, rows(2).right) === ((11, 11)))
    assert((rows.last.left, rows.last.right) === ((31, 40)))
  }

  test("utrBetween matches python slice semantics") {
    // dna[10:19] in python = chars 11..19 1-based
    assert(GeneOps.utrBetween(dna, 10, 20) === dna.substring(10, 19))
    assert(GeneOps.utrBetween(dna, 19, 20) === "")
  }

  test("gapsDF distributed form matches rangeRows gaps") {
    import spark.implicits._
    val segs = Seq(seg("a", 5, 10), seg("b", 30, 40), seg("c", 42, 60))
    val df = segs.zipWithIndex
      .map { case (s, i) => (i, s.left, s.right) }.toDF("ord", "left", "right")
    val gaps = GeneOps.gapsDF(df, "ord").as[(Int, Int)].collect().toSeq
    val want = GeneOps.rangeRows(segs, 60).filter(_.name.startsWith("region"))
      .map(r => (r.left, r.right))
    assert(gaps === want)
  }

  test("distributionCounts renders count-desc with pct of ALL rows") {
    import spark.implicits._
    val df = Seq("x", "x", "y", "z", "z", "z").toDF("k")
    val got = GeneOps.distributionCounts(df, "k", total = 6).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq(("z", 3L, 50.0), ("x", 2L, 33.3333), ("y", 1L, 16.6667)))
  }
}
