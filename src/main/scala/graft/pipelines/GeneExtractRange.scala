package graft.pipelines

import graft.bio.GeneOps

/** GeneExtract `range` mode (reference `gene_extract.py:57-86`,
  * `extract_sequence_based_on_range`, chained after EcoCyc enrichment in
  * `run_ecocyc_analysis.py:26-32`): echo the input TSV, filling the
  * `sequence` column from the genome wherever it is empty.
  *
  * Parity notes (differential-tested byte-for-byte):
  *   - the range comes from the LAST TWO columns (`left_idx=-2`,
  *     `right_idx=-1` defaults), NOT from columns named start/end;
  *   - the extraction applies the reverse-range ±1 shim
  *     ([[GeneOps.extractRange]]): `start > end` shifts the window one
  *     right, then reverse-complements;
  *   - a row whose `sequence` cell is already non-empty passes through
  *     untouched; a row whose range fails to parse keeps its cells as-is
  *     (the reference prints a traceback and moves on);
  *   - output columns are exactly the input header, in order; cells for
  *     absent trailing columns render as empty strings.
  */
object GeneExtractRange {

  def run(dna: String, inputText: String): String = {
    val lines = inputText.linesIterator.map(_.trim).toVector
    val invHeaders = lines.head.split("\t").toVector
    val sb = new StringBuilder(lines.head)
    sb.append('\n')
    lines.tail.foreach { line =>
      val infos = line.split("\t", -1)
      val result = scala.collection.mutable.Map.empty[String, String]
      infos.zipWithIndex.foreach { case (info, idx) => result(invHeaders(idx)) = info }
      if (result.getOrElse("sequence", "").isEmpty) {
        try {
          val a = infos(infos.length - 2).toInt
          val b = infos(infos.length - 1).toInt
          result("sequence") = GeneOps.extractRange(dna, a, b)
        } catch {
          case _: RuntimeException => () // reference: traceback + continue
        }
      }
      sb.append(invHeaders.map(h => result.getOrElse(h, "")).mkString("\t"))
      sb.append('\n')
    }
    sb.toString
  }
}
