package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** EcoCyc enrichment (cache mode) vs goldens from EXECUTING the reference
  * EcocycAnalysis offline on the same synthetic cache: two resolvable
  * genes (forward and reverse map positions, different product keys) and
  * one missing gene that takes the error path.
  */
class EcocycEnrichPipelineSpec extends AnyFunSuite {

  private def res(name: String) = Source.fromResource(name).mkString

  test("enrichment output and error file match the executed reference") {
    val (result, errors) = EcocycEnrichPipeline.run(
      res("eco_input.tsv"),
      name => scala.util.Try(res(s"eco_cache/$name")).toOption)
    assert(result === res("eco_cache/golden_result.txt"))
    assert(errors === res("eco_cache/golden_error.txt"))
  }

  test("JSON links parser handles the TU diagram shape") {
    val links = EcocycEnrichPipeline.parseLinks(res("eco_cache/promoter_EG777.json"))
    assert(links.length === 12)
    assert(links.head.length === 7)
    assert(links.head(0) === "0")
  }
}
