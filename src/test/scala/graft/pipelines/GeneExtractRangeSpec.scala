package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

import graft.io.GenBank

/** Differential golden from EXECUTING the reference GeneExtract in
  * `range` mode (`gene_extract.py:57-86`) on `fg_genome.gb` ×
  * `ge_range_input.txt`: forward range, reverse range (±1 shim +
  * reverse complement), prefilled-sequence passthrough, and the
  * degenerate equal-endpoints case.
  */
class GeneExtractRangeSpec extends AnyFunSuite {

  private def res(name: String) = Source.fromResource(name).mkString

  test("range-mode extract matches executed reference byte-for-byte") {
    val gb = GenBank.parse(res("fg_genome.gb"))
    val got = GeneExtractRange.run(gb.dna, res("ge_range_input.txt"))
    assert(got === res("ge_range_golden.txt"))
  }
}
