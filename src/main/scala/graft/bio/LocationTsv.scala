package graft.bio

import graft.io.EcocycRecord

/** G6 + K2 — the location-result → TSV converter (reference
  * `format_data_to_tsv` + `extract_consistency_record`,
  * `gene_location_analysis.py:307-418`): one TSV row per classified
  * location of each hit, enriched from the EcoCyc gene table, with the
  * consistency run intervals as DYNAMIC TRAILING COLUMN PAIRS
  * (`location start %d` / `location end %d`) padded to the widest row.
  */
object LocationTsv {

  val baseHeaders: Seq[String] = Seq(
    "index", "name", "weighted_similarity", "textedit_similarity",
    "direct_similarity", "consistency_similarity", "location",
    "gene_name", "type", "exonic_gene_sizes", "product",
    "site", "target_sequence")

  final case class Row(values: Map[String, String], intervals: Seq[(Int, Int)])

  /** Consistency run intervals: 1-based [idx+2−score, idx+1] positions
    * where the cumulative '*' run reaches the consistency score
    * (reference `gene_location_analysis.py:399-409`; '.' resets, other
    * characters — including '-' — extend).
    */
  def runIntervals(mask: String, bestCnt: Int): Seq[(Int, Int)] = {
    if (bestCnt <= 0) return Nil
    val out = Vector.newBuilder[(Int, Int)]
    var score = 0
    var i = 0
    while (i < mask.length) {
      if (mask.charAt(i) == '.') score = 0 else score += 1
      if (score == bestCnt) out += ((i + 2 - score, i + 1))
      i += 1
    }
    out.result()
  }

  /** The sense/antisense label (reference `update_data`,
    * `gene_location_analysis.py:352-370`): record direction EQUAL to hit
    * direction → "antisense" (the reference's convention — the scan hit is
    * the reverse complement of the matched strand), else "sense";
    * 5'/3' append "utr" without the quote.
    */
  def locationLabel(kind: String, hitDirection: Char, recordDirection: Char): String = {
    if (kind == "inter-genic") "inter genic"
    else {
      val base = if (recordDirection == hitDirection) "antisense" else "sense"
      if (kind == "5'" || kind == "3'") s"$base ${kind.dropRight(1)}utr"
      else s"$base $kind"
    }
  }

  /** Expand one located hit into its TSV rows (one per location entry). */
  def rows(
      index: Int,
      hit: LocatedHit,
      eco: Map[String, EcocycRecord]): Seq[Row] = {
    val hitDirection = if (hit.start < hit.end) '>' else '<'
    val consistency = hit.scores.get("consistency").map(_.toInt).getOrElse(0)
    val intervals = runIntervals(hit.matchTrack, consistency)
    val base = Map(
      "index" -> index.toString,
      "name" -> hit.name,
      "weighted_similarity" -> f"${hit.weightedSimilarity}%.2f",
      "consistency_similarity" -> hit.scores.get("consistency").map(s => f"$s%.2f").getOrElse(""),
      "direct_similarity" -> hit.scores.get("direct").map(s => f"$s%.2f").getOrElse(""),
      "textedit_similarity" -> hit.scores.get("text_edit").map(s => f"$s%.2f").getOrElse(""),
      "site" -> s"${hit.start}-${hit.end}",
      "target_sequence" -> hit.targetTrack)
    hit.locations.map { loc =>
      val recordDirection = if (loc.recordStart < loc.recordEnd) '>' else '<'
      val label = locationLabel(loc.kind, hitDirection, recordDirection)
      val enrich: Map[String, String] =
        if (loc.kind == "inter-genic") Map("gene_name" -> loc.name)
        else eco.get(loc.name.trim) match {
          case Some(r) => Map(
            "gene_name" -> loc.name,
            "type" -> r.recordType,
            "exonic_gene_sizes" -> r.exonicGeneSizes,
            "product" -> r.product)
          case None => Map("gene_name" -> loc.name) // "might be a promoter"
        }
      Row(base + ("location" -> label) ++ enrich, intervals)
    }
  }

  /** K2 — render rows with headers in fixed order plus dynamic trailing
    * `location start i`/`location end i` pairs padded to the maximum
    * interval count (reference `format_data_to_tsv:334-346`).
    */
  def render(rows: Seq[Row]): String = {
    val maxIntervals = (0 +: rows.map(_.intervals.length)).max
    val headers = baseHeaders ++
      (1 to maxIntervals).flatMap(i => Seq(s"location start $i", s"location end $i"))
    val sb = new StringBuilder(headers.mkString("\t"))
    sb.append('\n')
    rows.foreach { r =>
      val fixed = baseHeaders.map(h => r.values.getOrElse(h, ""))
      val dyn = r.intervals.flatMap { case (s, e) => Seq(s.toString, e.toString) }
      val padded = fixed ++ dyn ++ Seq.fill((maxIntervals - r.intervals.length) * 2)("")
      sb.append(padded.mkString("\t")).append('\n')
    }
    sb.toString
  }
}
