package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** EcoCyc HTML parsers vs goldens from EXECUTING the reference
  * `EcocycHTMLParser` on the same fixture strings (attr table with nested
  * links, script-redirect id, anchor-based id with nested markup, summary
  * paragraphs, reversed map positions).
  */
class EcocycHtmlSpec extends AnyFunSuite {

  private val attrHtml =
    """<html><body>
      |<table>
      |<tr><td>Gene</td><td>napF</td></tr>
      |<tr><td>Locations</td><td>chromosome site 42</td></tr>
      |<tr><td>Map Position</td><td>[2,301 -> 2,910]</td></tr>
      |<tr><td>Reaction</td><td><a href="/x">H2O + ATP</a><a href="/y">ADP + P</a></td></tr>
      |<tr><td>Polypeptide</td><td>NapF subunit</td></tr>
      |<tr><td>Other Row</td><td>ignored value</td></tr>
      |</table>
      |<script>var x = {typeObjectPage: true, gene:'EG12068', other: 1};</script>
      |</body></html>""".stripMargin

  test("attribute-table extraction matches executed reference") {
    val r = EcocycHtml.parse(attrHtml)
    assert(r.attributes.get("gene") === Some("napF"))
    assert(r.attributes.get("location") === Some("chromosome site 42"))
    assert(r.attributes.get("reaction") === Some("H2O + ATP__#####__ADP + P__#####__"))
    assert(r.attributes.get("polypeptide") === Some("NapF subunit"))
    assert(!r.attributes.contains("other row"))
    assert(r.mapPosition === Some((2301, 2910)))
    assert(r.ecocycId === Some("EG12068")) // typeObjectPage script
  }

  test("id extraction from redirect script") {
    val html =
      """<html><body>
        |<script>window.location.replace('/gene?orgid=ECOLI&id=EG10284');</script>
        |</body></html>""".stripMargin
    val r = EcocycHtml.parse(html, extractId = true, geneName = "araC")
    assert(r.ecocycId === Some("EG10284"))
  }

  test("id extraction from gene links with nested markup") {
    val html =
      """<html><body>
        |<a href="/gene?orgid=ECOLI&id=EG11111">araB</a>
        |<a href="/gene?orgid=ECOLI&id=EG10284">ara<i>C</i></a>
        |</body></html>""".stripMargin
    val r = EcocycHtml.parse(html, extractId = true, geneName = "araC")
    assert(r.ecocycId === Some("EG10284"))
  }

  test("summary extraction concatenates until the ecoparagraph footer") {
    val html =
      """<html><body>
        |<h3>Summary</h3>
        |<p>The napF operon encodes  </p><p>periplasmic nitrate reductase.</p>
        |<p class="ecoparagraph">citation footer</p>
        |</body></html>""".stripMargin
    val r = EcocycHtml.parse(html, extractSummary = true)
    assert(r.summary === Some("The napF operon encodesperiplasmic nitrate reductase."))
  }

  test("map position parses both arrow directions") {
    assert(EcocycHtml.extractMapPosition("see [4,275 <- 1,234] here") === ((1234, 4275)))
    assert(EcocycHtml.extractMapPosition("[10 -> 20]") === ((10, 20)))
  }

  test("id helpers") {
    assert(EcocycHtml.extractIdFromData("'/gene?orgid=ECOLI&id=EG42'") === Some("EG42"))
    assert(EcocycHtml.extractIdFromData("no id here") === None)
    assert(EcocycHtml.extractIdFromScript("x{typeObjectPage, gene:'EG7'}") === Some("EG7"))
    // reference regex `<\w+>` strips open tags only — `</i>` survives
    assert(EcocycHtml.extractGeneName("ara<i>C</i>") === "araC</i>")
  }
}
