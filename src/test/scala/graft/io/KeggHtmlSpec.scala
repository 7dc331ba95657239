package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** URL/GO/KEGG scrape parsers vs goldens from EXECUTING the reference
  * parsers on the same fixtures.
  */
class KeggHtmlSpec extends AnyFunSuite {

  test("UrlHTMLParser port: href + id/object param + link text") {
    val html =
      """<html><body>
        |<a href="/gene?orgid=ECOLI&amp;id=EG10284">araC page</a>
        |<a href="/search?object=TU00023&amp;q=x">TU page</a>
        |</body></html>""".stripMargin
    assert(KeggHtml.parseUrlList(html) === Vector(
      ("/gene?orgid=ECOLI&id=EG10284#tab=TU", Some("EG10284"), "araC page"),
      ("/search?object=TU00023&q=x#tab=TU", Some("TU00023"), "TU page")))
  }

  test("GoHTMLParser port: outer keys, inner link values comma-joined") {
    val html =
      """<html><body>
        |<table class="go"><tr><td> Biological process : </td><td>
        |  <table><tr><td>x</td><td><a>GO:0006810</a><a>GO:0055085</a></td></tr></table>
        |</td></tr><tr><td> Molecular function :</td><td>
        |  <table><tr><td>y</td><td><a>GO:0008137</a></td></tr></table>
        |</td></tr></table>
        |</body></html>""".stripMargin
    assert(KeggHtml.parseGoTable(html) === Vector(
      ("Biological process", "GO:0006810,GO:0055085"),
      ("Molecular function", "GO:0008137")))
  }

  test("GoHTMLParser: outer table without class attribute is skipped") {
    val html = """<table><tr><td>Key</td><td><table><tr><td>x</td><td><a>GO:1</a></td></tr></table></td></tr></table>"""
    assert(KeggHtml.parseGoTable(html) === Vector.empty)
  }

  test("KeggIdHTMLParser port: ids collected after the ORTHOLOGY marker") {
    val html =
      """<html><body>
        |<span>KEGG GENES</span>
        |<span>KEGG ORTHOLOGY</span>
        |<a href="/entry/K02567">K02567</a> nitrate reductase
        |<a href="/entry/K02568">K02568</a> other
        |<span>KEGG MGENES</span>
        |<a href="/entry/K99999">K99999</a>
        |</body></html>""".stripMargin
    // reference quirk preserved: end keywords are declared but never used,
    // so K99999 is still collected
    assert(KeggHtml.parseKeggIdMap(html) === Map(
      "K02567" -> "/entry/K02567",
      "K02568" -> "/entry/K02568",
      "K99999" -> "/entry/K99999"))
  }

  test("KeggPathwayHTMLParser port: names split on comma, pathways per table") {
    val html =
      """<html><body>
        |<nobr>Name</nobr><td>napF, yejX</td>
        |<nobr>Pathway</nobr><td><table><tr><td>Nitrogen</td><td>metabolism</td></tr></table>
        |<table><tr><td>Two-component system</td></tr></table></td>
        |</body></html>""".stripMargin
    val r = KeggHtml.parseKeggPathways(html)
    assert(r.names === Vector("napF", "yejX"))
    assert(r.pathways === Vector("Nitrogen metabolism", "Two-component system"))
  }
}
