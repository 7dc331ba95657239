package graft.bio

import graft.io.{BlockText, SimilarityBlock}

/** The file-level location-analysis pipeline (reference
  * `GeneLocationAnalysis.run`, `gene_location_analysis.py:39-82`): parse
  * match-result blocks → probe + classify each against the annotation
  * index → render the location report; then the sub-data pass
  * (`extract_sub_data:104-147` + span filter `:84-102`) → sub-location
  * report. Returns both report texts — byte-compatible with the
  * reference (asserted end-to-end on the synthetic-genome run).
  *
  * This is the parity surface; the distributed form of the same probe is
  * [[IntervalLocation.locateHits]] over a Dataset of hits (the block-text
  * format is an import/export codec only — SURVEY D8 decision).
  */
object LocationAnalysis {

  def run(
      matchText: String,
      records: Array[InterRecord],
      processSubData: Boolean = true,
      filterSubSpan: Option[(Int, Int)] = None): (String, String) = {
    val blocks = BlockText.blocks(matchText).map(BlockText.parseSimilarityBlock)
    val main = new StringBuilder
    blocks.zipWithIndex.foreach { case (b, idx) =>
      val locations = IntervalLocation.locate(records, b.start, b.end)
      main.append(s"(${idx + 1})\n")
      main.append(b.header).append('\n')
      main.append(b.matchInfo).append('\n')
      main.append(b.direction).append('\n')
      b.additional.foreach(l => main.append(l).append('\n'))
      locations.foreach(l => main.append(IntervalLocation.renderLocation(l)).append('\n'))
      main.append('\n')
    }

    val sub = new StringBuilder
    if (processSubData) {
      blocks.zipWithIndex.foreach { case (b, idx) =>
        extractSubData(b).zipWithIndex.foreach { case (s, subIdx) =>
          val locations = IntervalLocation.locate(records, s.start, s.end)
          if (passesFilter(locations, s.start, s.end, filterSubSpan)) {
            sub.append(s"(${idx + 1}-${subIdx + 1})\n")
            sub.append(s.header).append('\n')
            sub.append(s"Original Position\t${s.left}\t${s.right}\n")
            sub.append(s.matchInfo).append('\n')
            sub.append(b.direction).append('\n')
            b.additional.foreach(l => sub.append(l).append('\n'))
            locations.foreach(l => sub.append(IntervalLocation.renderLocation(l)).append('\n'))
            sub.append('\n')
          }
        }
      }
    }
    (main.toString, sub.toString)
  }

  final case class SubBlock(
      header: String,
      start: Int,
      end: Int,
      left: Int,   // 1-based run position within the parent window
      right: Int,
      matchInfo: String)

  /** Reference `extract_sub_data`: find the consistency match track and
    * best count in the parsed match-info text; each maximal '*' run
    * reaching the best count yields a sub block whose coordinates walk
    * from the parent's start in strand direction, and whose consistency
    * track lines are sliced to the run (separator becomes ': ').
    */
  def extractSubData(b: SimilarityBlock): Seq[SubBlock] = {
    val lines = b.matchInfo.split("\n", -1).toVector
    var matchFormat = ""
    var bestCnt = -1
    lines.foreach { kv =>
      if (kv.indexOf(':') >= 0) {
        val Array(k, v) = kv.split(":", 2)
        if (k.contains("consistency_match_format")) matchFormat = v.trim
      } else if (kv.contains("consistency_similarity")) {
        val v = kv.split("\t")(1)
        bestCnt = v.trim.toDouble.toInt
      }
    }
    if (bestCnt <= 0) return Nil
    val step = if (b.start < b.end) 1 else -1
    val out = Vector.newBuilder[SubBlock]
    var cur = 0
    var runStart = -1
    var i = 0
    val filePrefix = b.header.split("/")(0)
    while (i < matchFormat.length) {
      matchFormat.charAt(i) match {
        case '*' =>
          if (cur == 0) runStart = i
          cur += 1
        case '.' => cur = 0
        case _   => ()
      }
      if (cur == bestCnt) {
        val subStart = b.start + step * runStart
        val subEnd = b.start + step * i
        val info = lines.map { kv =>
          if (kv.indexOf(':') >= 0) {
            val Array(k, v) = kv.split(":", 2)
            if (k.contains("consistency")) k + ": " + v.trim.substring(runStart, math.min(i + 1, v.trim.length))
            else k + ": " + v.trim
          } else kv
        }.mkString("\n")
        out += SubBlock(s"$filePrefix/$subStart-$subEnd", subStart, subEnd,
          runStart + 1, i + 1, info)
      }
      i += 1
    }
    out.result()
  }

  /** Reference `pass_filter_sub_location`: the first rendered location must
    * be a 5' row for the filter to apply; the gene's raw start anchors the
    * orientation-aware `[start−span1, start+span2]` window.
    */
  def passesFilter(
      locations: Seq[LocationHit],
      subStart: Int,
      subEnd: Int,
      span: Option[(Int, Int)]): Boolean =
    SimilarityPipeline.passesSpanFilter(locations, subStart, subEnd, span)
}
