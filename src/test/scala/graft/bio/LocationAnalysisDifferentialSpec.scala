package graft.bio

import java.util.zip.GZIPInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.io.EcocycTsv

/** End-to-end differential for pipeline stage 2: the reference
  * `GeneLocationAnalysis` was EXECUTED on the synthetic-genome match
  * results (3,918 blocks) against a 12-gene annotation TSV with
  * `filter_sub_span=(45,25)`; both its outputs (1.3 MB each) are stored
  * gzipped. Our file-level pipeline must reproduce them byte-for-byte —
  * probe window, 8-way classification, decile tracks, sub-run extraction,
  * span filter, and all rendering.
  */
class LocationAnalysisDifferentialSpec extends AnyFunSuite {

  private def gzResource(name: String): String = {
    val in = new GZIPInputStream(getClass.getClassLoader.getResourceAsStream(name))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("location + sub-location reports match the executed reference byte-for-byte") {
    val matchText = gzResource("syn_match_result.txt.gz")
    val wantMain = gzResource("syn_location_result.txt.gz")
    val wantSub = gzResource("syn_sub_location_result.txt.gz")

    // annotation index exactly as the reference loader builds it (no promoters)
    val lines = scala.io.Source.fromResource("syn_ecocyc.tsv").getLines().toVector
    val header = lines.head.split("\t").zipWithIndex.toMap
    val records = lines.tail.map { l =>
      val c = l.split("\t", -1)
      def s(n: String) = c.lift(header(n)).getOrElse("")
      def p(n: String) = { val v = s(n); if (v.isEmpty) -1 else v.toInt }
      InterRecord(s("gene"), s("product"), p("map_start_pos"), p("map_end_pos"), isGene = true)
    }.sortBy(_.start).toArray

    val (gotMain, gotSub) = LocationAnalysis.run(
      matchText, records, processSubData = true, filterSubSpan = Some((45, 25)))

    assert(gotMain.length === wantMain.length,
      s"main length ${gotMain.length} vs ${wantMain.length}")
    assert(gotMain === wantMain)
    assert(gotSub.length === wantSub.length,
      s"sub length ${gotSub.length} vs ${wantSub.length}")
    assert(gotSub === wantSub)
  }
}
