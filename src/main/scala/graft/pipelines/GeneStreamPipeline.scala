package graft.pipelines

import graft.bio.GeneOps
import graft.io.GenBankFile

/** Pipeline — gene stream analysis (reference `GeneStreamAnalysis`):
  * "stream" = the gene sequence with up/downstream DNA flanks (W2), not
  * event streams (SURVEY §2.10). Two modes:
  *
  *   - rna: dynamic-header TSV rows (gene, map_start_pos, map_end_pos) →
  *     per matching segment, the flanked sequences (minus-strand rows
  *     reverse-complement and swap flanks);
  *   - inter: `left,right` rows → nearest gene strictly left/right
  *     (STRICT inequalities — unlike the neighbor probe's `<=`).
  *
  * Quirks preserved: the row index is the enumerate position (missing
  * genes leave gaps), `->`-suffixed names truncate, absent product/id
  * render as "None".
  */
object GeneStreamPipeline {

  def runRna(inputTsv: String, gb: GenBankFile, limit: Int): String = {
    val lines = inputTsv.linesIterator.toVector
    val header = lines.head.trim.split("\t").zipWithIndex.toMap
    val sb = new StringBuilder
    lines.tail.zipWithIndex.foreach { case (line, geneIdx) =>
      val items = line.split("\t")
      var geneName = items(header("gene")).trim
      val start = items(header("map_start_pos")).trim.toInt
      val end = items(header("map_end_pos")).trim.toInt
      if (geneName.indexOf("->") >= 0) geneName = geneName.substring(0, geneName.indexOf("->"))
      val segments = gb.segments.filter(_.gene.contains(geneName))
      if (segments.nonEmpty) {
        sb.append(s"$geneIdx. $geneName\n")
        segments.zipWithIndex.foreach { case (seg, i) =>
          val (seq, up, down) = GeneOps.flanking(gb.dna, seg.left, seg.right, start > end, limit)
          sb.append(s"${i + 1})\n")
          sb.append(s"position\t${seg.left} ${if (start < end) "->" else "<-"} ${seg.right}\n")
          sb.append(s"product\t${seg.product.getOrElse("None")}\n")
          sb.append(s"GeneID\t${seg.geneId.map(_.toString).getOrElse("None")}\n")
          sb.append(s"stream\t$seq\n")
          if (up.nonEmpty) sb.append(s"upstream\t$up\n")
          if (down.nonEmpty) sb.append(s"downstream\t$down\n")
          sb.append('\n')
        }
      }
    }
    sb.toString
  }

  def runInter(inputLines: Seq[String], gb: GenBankFile): String = {
    val sb = new StringBuilder
    inputLines.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val Array(left, right) = line.split(",").map(_.toInt)
      // STRICT nearest selection (reference `check_inter`,
      // `gene_stream_analysis.py:69-89`): max(cds) < left / min(cds) > right
      var up: graft.io.GeneSegment = null
      var down: graft.io.GeneSegment = null
      gb.segments.foreach { seg =>
        if (math.max(seg.left, seg.right) < left &&
            (up == null || math.max(up.left, up.right) < math.max(seg.left, seg.right)))
          up = seg
        if (math.min(seg.left, seg.right) > right &&
            (down == null || math.min(down.left, down.right) > math.min(seg.left, seg.right)))
          down = seg
      }
      sb.append(s"$line:\n")
      if (up != null) {
        sb.append(s"up-gene\t${up.gene.getOrElse("None")}\n")
        sb.append(s"up-position\t${up.left}-${up.right}\n")
        sb.append(s"up-product\t${up.product.getOrElse("None")}\n")
      }
      if (down != null) {
        sb.append(s"down-gene\t${down.gene.getOrElse("None")}\n")
        sb.append(s"down-position\t${down.left}-${down.right}\n")
        sb.append(s"down-product\t${down.product.getOrElse("None")}\n")
      }
      sb.append('\n')
    }
    sb.toString
  }
}
