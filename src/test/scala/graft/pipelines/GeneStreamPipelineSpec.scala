package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

import graft.io.GenBank

/** Gene-stream pipeline vs goldens from the EXECUTED reference on the
  * GenBank fixture: forward/reverse flanking, missing-gene gaps in the
  * numbering, arrow-name truncation, and the strict inter-mode nearest
  * selection.
  */
class GeneStreamPipelineSpec extends AnyFunSuite {

  private def res(name: String) = Source.fromResource(name).mkString
  private lazy val gb = GenBank.parse(res("test_genome.gb"))

  test("rna mode matches executed reference byte-for-byte") {
    val got = GeneStreamPipeline.runRna(res("gs_input.tsv"), gb, limit = 15)
    assert(got === res("gs_rna_golden.txt"))
  }

  test("inter mode matches executed reference byte-for-byte") {
    val got = GeneStreamPipeline.runInter(res("gs_inter.txt").linesIterator.toSeq, gb)
    assert(got === res("gs_inter_golden.txt"))
  }
}
