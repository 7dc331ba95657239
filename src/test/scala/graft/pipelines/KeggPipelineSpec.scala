package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite

class KeggPipelineSpec extends AnyFunSuite {

  private val idPage =
    """<html><body><span>KEGG ORTHOLOGY</span>
      |<a href="/entry/K02567">K02567</a>
      |<a href="/entry/K02568">K02568</a>
      |</body></html>""".stripMargin

  private def pathwayPage(names: String, p1: String, p2: String) =
    s"""<html><body>
       |<nobr>Name</nobr><td>$names</td>
       |<nobr>Pathway</nobr><td><table><tr><td>$p1</td></tr></table>
       |<table><tr><td>$p2</td></tr></table></td>
       |</body></html>""".stripMargin

  private val cache = Map(
    "get_kegg_id_napF.html" -> idPage,
    "get_pathway_K02567.html" -> pathwayPage("napF, napG", "Nitrogen metabolism", "Two-component system"),
    "get_pathway_K02568.html" -> pathwayPage("napB", "Nitrogen metabolism", "Oxidative phosphorylation"))

  test("gene mode: two-level expansion gene -> ids -> pathways") {
    val (out, err) = KeggPipeline.runForGenes(Seq("napF", "ghost"), cache.get)
    assert(out ===
      "napF\tK02567\tNitrogen metabolism; Two-component system\n" +
      "napF\tK02568\tNitrogen metabolism; Oxidative phosphorylation\n")
    assert(err === "ghost\n")
  }

  test("kegg-id mode: one row per parsed name") {
    val (out, err) = KeggPipeline.runForKeggIds(Seq("K02567", "K99999"), cache.get)
    assert(out ===
      "K02567\tnapF\tNitrogen metabolism; Two-component system\n" +
      "K02567\tnapG\tNitrogen metabolism; Two-component system\n")
    assert(err === "K99999\n")
  }
}
