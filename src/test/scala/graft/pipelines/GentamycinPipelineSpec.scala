package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

import graft.io.GenBank

/** Gentamycin expansion vs sequences from the EXECUTED reference
  * extraction on the GenBank fixture.
  */
class GentamycinPipelineSpec extends AnyFunSuite {

  private lazy val gb = GenBank.parse(Source.fromResource("test_genome.gb").mkString)

  test("locus rows expand with strand-aware sequences (reference goldens)") {
    val input =
      "Gene\tLocus\tnote\n" +
        "DR1\tNC_TEST:10-45(+)\ta\n" +
        "DR2\tNC_TEST:60-120(-)\tb\n" +
        "DR3\tNC_TEST:5-12(+)\tc\n"
    val (main, consistency) = GentamycinPipeline.run(input, gb)
    val rows = main.linesIterator.toVector
    assert(rows.head === "Gene\tLocus\tnote\tsequence")
    assert(rows(1).endsWith("\tttctgactgcaacgggcaatatgtctctgtgtggat"))
    assert(rows(2).endsWith("\tcctaagtcaataaaattttaatttactcacggcaggtaaccagttcagaagctgctatcag"))
    assert(rows(3).endsWith("\ttttcattc"))
    val crows = consistency.linesIterator.toVector
    assert(crows.head === "name\tgene")
    assert(crows(1) === "DR1\tttctgactgcaacgggcaatatgtctctgtgtggat")
  }
}
