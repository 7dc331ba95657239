package graft.pipelines

import graft.bio.{Dna, GeneOps, IntervalLocation}
import graft.io.{FastaRecord, GenBankFile}

/** Pipeline — gentamycin locus expansion (reference `GentamycinAnalysis`,
  * `gentamycin.py`): the F6 apply-expand pattern — parse each row's
  * `name:left-right(±)` locus, extract the strand-aware sequence, append
  * it as a new column, and emit the consistency prep table.
  *
  * Two modes, mirroring the reference's database switch:
  *
  *   - NCBI mode ([[run]]): faithful port, differential-tested.
  *   - ATCC mode ([[runAtcc]]): the reference branch CANNOT run — three
  *     independent defects: `expand_one_record_from_atcc` calls `.get` on
  *     a generator (`gentamycin.py:74-77`;
  *     `get_nearby_gene_based_by_range` yields, `gene_position_helper.py:
  *     18-43`); `generate_result` reads `segment.left/right` which
  *     `ATCCGeneSegment` never defines (it has `start`/`end`,
  *     `atcc_database.py:11-18`); and the `['related','hit','sequence']`
  *     expand headers are keys the helper's yielded dicts never contain.
  *     [[runAtcc]] is therefore RECONSTRUCTED fixed semantics — explicit
  *     opt-in (`Main gentamycin --atcc`), clearly not reference parity —
  *     assembled from the evidently intended design: consume the
  *     generator fully (as `found_gene_name_near_a_range.py:45` does with
  *     the same helper), map `start/end` to `left/right`, put genes the
  *     probe classifies `hit` in the `hit` column and all other found
  *     genes in `related`, and serialize `sequence` as the JSON
  *     tag→sequence object that `generate_consistency_df`'s
  *     `json.loads(sequences).items()` (`gentamycin.py:44-57`) expects.
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

  /** ATCC mode with reconstructed semantics (see object scaladoc — the
    * reference branch is unrunnable; this is an explicit-opt-in fix, not
    * parity). Only `DR`-prefixed genes expand (`gentamycin.py:69-70`);
    * other rows get three empty cells. The range probe is the same
    * first-greater-equal walk as G4 ([[IntervalLocation
    * .nearbyGenesByRange]]); '−' loci complement each found sequence
    * WITHOUT reversing (`generate_result`'s `get_opposite_dna(sequence)`,
    * `gene_position_helper.py:47-49` — the same quirk G4 pins).
    * Returns (main TSV with related/hit/sequence appended, consistency
    * TSV `name\tgene` with one row per found tag, name = Gene + '-' +
    * tag).
    */
  def runAtcc(inputTsv: String, records: Vector[FastaRecord]): (String, String) = {
    val segs = records.filter(r => r.start.isDefined && r.end.isDefined)
      .sortBy(r => (r.start.get, r.end.get))
    val lefts = segs.map(_.start.get).toArray
    val rights = segs.map(_.end.get).toArray
    val lines = inputTsv.linesIterator.toVector
    val headers = lines.head.trim.split("\t").toVector
    val geneIdx = headers.indexOf("Gene")
    val locusIdx = headers.indexOf("Locus")
    require(geneIdx >= 0 && locusIdx >= 0, "input must have Gene and Locus columns")
    val extra = Seq("related", "hit", "sequence")
    val main = new StringBuilder((headers ++ extra).mkString("\t") + "\n")
    val consistency = new StringBuilder("name\tgene\n")

    lines.tail.filter(_.trim.nonEmpty).foreach { line =>
      val cells = line.split("\t", -1).toVector
      val expanded: Seq[String] =
        if (!cells(geneIdx).startsWith("DR")) Seq("", "", "")
        else {
          val (_, left, right, direction) = GeneOps.parseLocus(cells(locusIdx).trim)
          val found = IntervalLocation.nearbyGenesByRange(lefts, rights, left, right)
            .map { case (i, geneType) =>
              val seg = segs(i)
              val seq = if (direction == '-') Dna.complement(seg.sequence) else seg.sequence
              (seg.gene, geneType, seq)
            }
          val hit = found.collect { case (g, "hit", _) => g }.mkString(",")
          val related = found.collect { case (g, t, _) if t != "hit" => g }.mkString(",")
          val json = found.map { case (g, _, s) => s""""$g":"$s"""" }.mkString("{", ",", "}")
          found.foreach { case (g, _, s) =>
            consistency.append(s"${cells(geneIdx)}-$g\t$s\n")
          }
          Seq(related, hit, if (found.isEmpty) "" else json)
        }
      main.append((cells ++ expanded).mkString("\t")).append('\n')
    }
    (main.toString, consistency.toString)
  }
}
