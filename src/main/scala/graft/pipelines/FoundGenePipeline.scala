package graft.pipelines

import graft.bio.{Dna, GeneOps, IntervalLocation}
import graft.io.GenBankFile

/** G4 — the `FoundGeneNameNearARange` composition (reference
  * `src/analysis/found_gene_name_near_a_range.py:19-57` driven by
  * `src/run_found_gene_near_a_range.py`): for each input row's
  * `[start,end]` range, probe the gene index with the J8 nearby-genes
  * search ([[IntervalLocation.nearbyGenesByRange]]), explode one output
  * row per found gene, and emit the fixed `near_gene` TSV columns.
  *
  * Parity notes (differential-tested byte-for-byte):
  *   - direction comes from the START/END ORDER (`start > end` ⇒ '−'),
  *     not from the locus column;
  *   - `length` is computed from the `locus` column's `name:l-r(±)` span,
  *     `compare_length` from the start/end span — both overwrite any input
  *     column of the same name;
  *   - '−' ranges complement the gene sequence WITHOUT reversing
  *     ([[Dna.complement]] — `gene_position_helper.py:47-49` quirk);
  *   - input columns missing from a row render as empty strings
  *     (pandas `Series.get(col, '')`).
  *
  * The probe side is dictionary-sized (a genome's gene index); the
  * distributed form of the same probe is a broadcast sorted array +
  * `flatMap`, exactly as [[IntervalLocation.locateHits]] does for J1 —
  * this file-to-file surface is the reference-parity CLI path.
  */
object FoundGenePipeline {

  val keepHeaders: Seq[String] = Seq(
    "name", "file", "length", "start", "end", "compare_length",
    "type", "gene", "gene_left", "gene_right", "sequence")

  def run(inputTsv: String, gb: GenBankFile): String = {
    // GenBank features are position-ordered in practice; sort defensively
    // so the binary-search probe never sees an unsorted index
    val segs = gb.segments.toIndexedSeq.sortBy(s => (s.left, s.right))
    val lefts = segs.map(_.left).toArray
    val rights = segs.map(_.right).toArray
    val lines = inputTsv.linesIterator.toVector
    val headerIdx = lines.head.trim.split("\t").zipWithIndex.toMap
    val sb = new StringBuilder(keepHeaders.mkString("\t"))
    sb.append('\n')
    lines.tail.filter(_.trim.nonEmpty).foreach { line =>
      val cells = line.split("\t", -1)
      def cell(h: String): String =
        headerIdx.get(h).filter(_ < cells.length).map(cells(_)).getOrElse("")
      val start = cell("start").toInt
      val end = cell("end").toInt
      val (left, right, direction) =
        if (start > end) (end, start, '-') else (start, end, '+')
      val (_, locusLeft, locusRight, _) = GeneOps.parseLocus(cell("locus"))
      val computed = Map(
        "length" -> (locusRight - locusLeft + 1).toString,
        "compare_length" -> (right - left + 1).toString)
      IntervalLocation.nearbyGenesByRange(lefts, rights, left, right).foreach {
        case (i, geneType) =>
          val seg = segs(i)
          val raw = gb.dna.substring(seg.left - 1, seg.right)
          val sequence = if (direction == '-') Dna.complement(raw) else raw
          val merged = computed ++ Map(
            "type" -> geneType,
            "gene" -> seg.gene.getOrElse(""),
            "gene_left" -> seg.left.toString,
            "gene_right" -> seg.right.toString,
            "sequence" -> sequence)
          sb.append(keepHeaders.map(h => merged.getOrElse(h, cell(h))).mkString("\t"))
          sb.append('\n')
      }
    }
    sb.toString
  }
}
