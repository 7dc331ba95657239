package graft.pipelines

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Neighbor pipeline (cache mode) vs goldens from EXECUTING the reference
  * NeighborAnalysis on the same cache + requests. The reference emits
  * probe entries from a hash-randomized Python set, so block ENTRY order
  * is compared set-wise; everything else (headers, sources, sequences,
  * next-gene picks, counters incl. the SOURCE-line-shift quirk) compares
  * exactly.
  */
class NeighborPipelineSpec extends AnyFunSuite {

  private def res(name: String) = Source.fromResource(name).mkString

  private lazy val results = {
    val gbText = res("syn_genome.gb")
    val requests = res("nb_input.txt").linesIterator
      .filter(_.startsWith(">")).map(NeighborPipeline.parseRequest).toSeq
    NeighborPipeline.run(requests,
      key => if (key == "NC_SYNB") Some(gbText) else None)
  }

  /** Normalize a block-structured report into comparable blocks with
    * entry-set semantics for the unordered probe lines.
    */
  private def blocks(text: String): Seq[(String, Set[String])] = {
    val out = Seq.newBuilder[(String, Set[String])]
    var header = ""
    var entries = Set.empty[String]
    (text.linesIterator ++ Iterator("")).foreach { l =>
      val line = l.trim
      if (line.isEmpty) {
        if (header.nonEmpty) { out += ((header, entries)); header = ""; entries = Set.empty }
      } else if (line.startsWith(">")) header = line
      else entries += line
    }
    out.result()
  }

  test("neighbor report matches executed reference (entry order set-wise)") {
    assert(blocks(results._1) === blocks(res("neighbor_goldens/nb_input_neighbor_result.txt")))
  }

  test("next-gene report matches exactly, including the SOURCE-shift quirk") {
    assert(results._2 === res("neighbor_goldens/nb_input_next_neighbor_result.txt"))
  }

  test("source and gene counters match exactly") {
    assert(results._3 === res("neighbor_goldens/nb_input_source_count_result.txt"))
    assert(results._4 === res("neighbor_goldens/nb_input_gene_count_result.txt"))
  }
}
