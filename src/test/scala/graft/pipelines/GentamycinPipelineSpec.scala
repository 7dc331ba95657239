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

  // ATCC mode is RECONSTRUCTED semantics (the reference branch cannot
  // run — see GentamycinPipeline scaladoc), so expectations here are
  // hand-computed from the intended design, not a reference golden.
  // Fixture segments sorted by start: dnaA(10..80), alr(100..200,
  // complement), Unknown:AT2(300..350).
  test("ATCC mode: DR rows expand via the range probe, others stay empty") {
    val records = graft.io.Fasta.parse(
      Source.fromResource("test_atcc.fna").mkString)
    val input =
      "Gene\tLocus\tnote\n" +
        "DR9\tNC_TEST:10-80(+)\ta\n" +   // exact span of dnaA -> hit
        "DR8\tNC_TEST:95-210(-)\tb\n" +  // overlaps alr 87% -> related, '-' complements
        "xyz\tNC_TEST:10-80(+)\tc\n"     // not DR-prefixed -> empty cells
    val (main, consistency) = GentamycinPipeline.runAtcc(input, records)
    val rows = main.linesIterator.toVector
    assert(rows.head === "Gene\tLocus\tnote\trelated\thit\tsequence")
    assert(rows(1) === "DR9\tNC_TEST:10-80(+)\ta\t\tdnaA\t{\"dnaA\":\"gggaaattt\"}")
    assert(rows(2) === "DR8\tNC_TEST:95-210(-)\tb\talr\t\t{\"alr\":\"tgcatgcatgcatgca\"}")
    assert(rows(3) === "xyz\tNC_TEST:10-80(+)\tc\t\t\t")
    val crows = consistency.linesIterator.toVector
    assert(crows === Vector(
      "name\tgene",
      "DR9-dnaA\tgggaaattt",
      "DR8-alr\ttgcatgcatgcatgca"))
  }
}
