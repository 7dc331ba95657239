package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

import graft.io.GenBank

/** G4 — differential golden produced by EXECUTING the reference
  * `FoundGeneNameNearARange.run` (`found_gene_name_near_a_range.py:19-57`
  * + `gene_position_helper.py:18-66`) on `fg_genome.gb` × `fg_input.txt`.
  * The fixture covers every probe branch: single candidate, covering
  * gene, adjacent pair fallback, multi-candidate explosion, a row whose
  * gene has no name, and a '−' range exercising the complement-without-
  * reverse quirk.
  */
class FoundGenePipelineSpec extends AnyFunSuite {

  private def res(name: String) = Source.fromResource(name).mkString

  test("near_gene TSV matches executed reference byte-for-byte") {
    val gb = GenBank.parse(res("fg_genome.gb"))
    val got = FoundGenePipeline.run(res("fg_input.txt"), gb)
    assert(got === res("fg_near_gene_golden.txt"))
  }
}
