package graft.pipelines

import graft.bio.GeneOps
import graft.io.GenBankFile

/** Pipeline — gentamycin locus expansion (reference `GentamycinAnalysis`,
  * `gentamycin.py`): the F6 apply-expand pattern — parse each row's
  * `name:left-right(±)` locus, extract the strand-aware sequence, append
  * it as a new column, and emit the consistency prep table.
  *
  * NCBI mode only: the reference's ATCC branch calls `.get` on a
  * generator (`expand_one_record_from_atcc`,
  * `gentamycin.py:74-77`) and cannot run — documented, not ported.
  */
object GentamycinPipeline {

  /** Expand a dynamic-header TSV with a `Locus` column: rows gain a
    * `sequence` column (reference `expand_one_record_from_ncbi` — note it
    * slices `dna[left-1:right]` with NO reverse shim, unlike
    * GeneExtract's range mode, then reverse-complements for '−').
    */
  def run(inputTsv: String, gb: GenBankFile): (String, String) = {
    val lines = inputTsv.linesIterator.toVector
    val headers = lines.head.trim.split("\t").toVector
    val locusIdx = headers.indexOf("Locus")
    require(locusIdx >= 0, "input must have a Locus column")
    val outHeaders = headers ++ (if (headers.contains("sequence")) Nil else Seq("sequence"))
    val main = new StringBuilder(outHeaders.mkString("\t") + "\n")
    val consistency = new StringBuilder("name\tgene\n")

    lines.tail.filter(_.trim.nonEmpty).foreach { line =>
      val cells = line.split("\t", -1).toVector
      val (_, left, right, direction) = GeneOps.parseLocus(cells(locusIdx))
      var seq = gb.dna.substring(left - 1, right)
      if (direction == '-') seq = graft.bio.Dna.reverseComplement(seq)
      val row = (outHeaders.map { h =>
        val i = headers.indexOf(h)
        if (h == "sequence") seq
        else if (i >= 0 && i < cells.length) cells(i)
        else ""
      })
      main.append(row.mkString("\t")).append('\n')
      val geneIdx = headers.indexOf("Gene")
      if (geneIdx >= 0)
        consistency.append(s"${cells(geneIdx)}\t$seq\n")
    }
    (main.toString, consistency.toString)
  }
}
