package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite

/** Search-count parser vs the executed reference `extract_result_info`
  * (goldens include the quirk that trailing text after the span survives).
  */
class SearchCountPipelineSpec extends AnyFunSuite {
  import SearchCountPipeline._

  test("extractResultInfo matches executed reference") {
    assert(extractResultInfo(
      "<html>\n<div class=\"results-amount\">\n  <span class=\"value\">1,234</span> results\n</div></html>")
      === "1,234 results")
    assert(extractResultInfo(
      "<html>\n<div class=\"results-amount\">\n No results were found blah\n</div></html>")
      === "0")
    assert(extractResultInfo("<html><body>single article page</body></html>") === "1")
    assert(extractResultInfo(
      "<html>\n<div class=\"results-amount\">\n\n   <span class=\"value\">7</span>\n</div></html>")
      === "7")
  }

  test("run emits the count table with Error for missing cache entries") {
    val cache = Map(
      "napF_drug.html" -> "<div class=\"results-amount\">\n<span class=\"value\">42</span>\n</div>",
      "napF_Kanamycin_B.html" -> "x\n<div class=\"results-amount\">\nNo results were found\n</div>")
    val out = SearchCountPipeline.run(Seq("napF"), cache.get,
      keywords = Seq("drug", "Kanamycin+B", "biofilm"))
    assert(out ===
      "gene\tdrug\tKanamycin+B\tbiofilm\n" +
      "napF\t42\t0\tError\n")
  }
}
