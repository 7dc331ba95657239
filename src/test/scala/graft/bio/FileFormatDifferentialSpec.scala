package graft.bio

import java.util.zip.GZIPInputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{EcocycRecord, EcocycTsv}

/** Pipeline-3 differential (reference `3-run_file_format.py:15` →
  * `format_data_to_tsv` + `extract_consistency_record`,
  * `gene_location_analysis.py:307-418`): the reference was EXECUTED on
  * the 3,918-block synthetic location result with the 12-gene EcoCyc
  * table; its TSV output (3,994 rows) is stored gzipped. Our text-parser
  * path must reproduce it byte-for-byte — including the dead
  * similarity-column keys, the kept-apostrophe `5'utr`/`3'utr` labels,
  * and the never-firing interval columns.
  */
class FileFormatDifferentialSpec extends AnyFunSuite {

  private def gzResource(name: String): String = {
    val in = new GZIPInputStream(getClass.getClassLoader.getResourceAsStream(name))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  test("file-format TSV matches the executed reference byte-for-byte") {
    val locText = gzResource("syn_location_result.txt.gz")
    val want = gzResource("syn_format_golden.tsv.gz")

    // annotation map exactly as EcocycDataLoader.build_database keys it
    val lines = scala.io.Source.fromResource("syn_ecocyc.tsv").getLines().toVector
    val header = lines.head.split("\t").zipWithIndex.toMap
    val eco: Map[String, EcocycRecord] = lines.tail.map { l =>
      val c = l.split("\t", -1)
      def s(n: String) = header.get(n).flatMap(c.lift).getOrElse("")
      def p(n: String) = { val v = s(n); if (v.isEmpty) -1 else v.toInt }
      s("gene") -> EcocycRecord(s("gene"), s("product_type"), s("product"),
        s("promoter_name"), p("promoter_pos"), p("gene_start_pos"),
        p("map_start_pos"), p("map_end_pos"), s("exonic_gene_sizes"), s("type"))
    }.toMap

    val got = LocationTsv.formatTsv(locText, eco)
    assert(got.length === want.length, s"length ${got.length} vs ${want.length}")
    assert(got === want)
  }
}
