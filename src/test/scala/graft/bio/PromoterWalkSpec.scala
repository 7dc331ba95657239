package graft.bio

import graft.SparkSpec

/** J9 promoter walk vs goldens from EXECUTING the reference
  * `gene_promoter_util` on the synthetic TU diagram in `test_tu.json`
  * (mixed directions, a promoter below the gene row, a promoter without a
  * start site, a raw-body element).
  */
class PromoterWalkSpec extends SparkSpec {

  private lazy val tus: Seq[GeneTU] = {
    val path = getClass.getClassLoader.getResource("test_tu.json").getPath
    PromoterWalk.readTuJson(spark, path).collect().head._2
  }

  private def gene(name: String): GeneTU = tus.find(_.isGene(name)).get

  test("JSON links parse: counts match reference filters") {
    assert(tus.length === 12)
    assert(PromoterWalk.allPromoters(tus).length === 6)
    assert(PromoterWalk.allPromoters(tus, checkStartSite = true).length === 5)
    assert(PromoterWalk.allGenes(tus, Some("Right")).length === 3)
    assert(PromoterWalk.allGenes(tus, Some("Left")).length === 2)
    assert(PromoterWalk.filterSameDirection(gene("alpha"),
      PromoterWalk.allPromoters(tus, checkStartSite = true)).length === 4)
    // raw-body element falls back to the Body attribute
    assert(tus.find(_.idx == 11).get.attributes === Map("Body" -> "some raw body"))
  }

  test("targetPromoter matches executed reference for every gene") {
    val golds = Seq(
      ("alpha", Some(0), Some(1100)),
      ("beta", Some(0), Some(1100)),
      ("gamma", Some(3), Some(1800)),
      ("delta", Some(7), Some(2200)),
      ("eps", Some(9), Some(2800)))
    for ((g, wantIdx, wantPos) <- golds) {
      val (p, pos) = PromoterWalk.targetPromoter(gene(g), tus)
      assert(p.map(_.idx) === wantIdx, s"promoter for $g")
      assert(pos === wantPos, s"near gene pos for $g")
    }
  }

  test("location parsing: direction and transcription start") {
    assert(gene("alpha").direction === "Right")
    assert(gene("alpha").geneStartPosition === 1100)
    assert(gene("delta").direction === "Left")
    assert(gene("delta").geneStartPosition === 2200) // 'a <- b': reference takes b
    assert(gene("alpha").promoterName === None)
    assert(tus.find(_.idx == 0).get.promoterStartSite === Some(1050))
  }
}
