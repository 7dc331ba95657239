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
    * 5'/3' append "utr" KEEPING the apostrophe ("antisense 5'utr" —
    * pinned by the executed-reference `syn_format_golden.tsv`).
    */
  def locationLabel(kind: String, hitDirection: Char, recordDirection: Char): String = {
    if (kind == "inter-genic") "inter genic"
    else {
      val base = if (recordDirection == hitDirection) "antisense" else "sense"
      if (kind == "5'" || kind == "3'") s"$base ${kind}utr"
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

  /** The pipeline-3 surface (reference `3-run_file_format.py:15` →
    * `format_data_to_tsv`, `gene_location_analysis.py:307-346`): parse a
    * location-result TEXT file into TSV rows via the reference's
    * line-oriented state machine (`extract_consistency_record:349-418`),
    * replicated exactly, including its dead branches:
    *
    *   - `text_distance_similarity` / `direct_match_similarity` lines are
    *     captured under those keys, which never match the output headers
    *     (`textedit_similarity` / `direct_similarity`) — those columns are
    *     therefore always empty;
    *   - `location interval` only fills from lines starting with
    *     `match_format` (the current render emits
    *     `consistency_match_format`, which does NOT match) and gates on a
    *     `consistency` key that is never set (the parser stores
    *     `consistency_similarity`), so the run-interval columns never
    *     materialize from this entry point — the structured-path
    *     [[rows]]/[[runIntervals]] is where they live;
    *   - one row is yielded per `<kind> of <genes>` line (deferred until
    *     the next location line or block end), carrying whatever state
    *     has accumulated so far.
    */
  def parseLocationResult(text: String, eco: Map[String, EcocycRecord]): Seq[Row] = {
    val simKeys = Set("weighted_similarity", "text_distance_similarity",
      "direct_match_similarity", "consistency_similarity")
    val kinds = Set("5'", "3'", "cds", "cover", "inter-genic")
    val out = Vector.newBuilder[Row]

    def emit(data: Map[String, String], intervals: Seq[(Int, Int)],
        locationType: String, genes: String,
        directionMatched: Option[Char], direction: Option[Char]): Unit = {
      val withLoc =
        if (locationType == "inter-genic")
          data + ("location" -> "inter genic", "gene_name" -> genes)
        else {
          val base = if (directionMatched == direction) "antisense" else "sense"
          val label =
            if (locationType == "5'" || locationType == "3'")
              s"$base ${locationType}utr"
            else s"$base $locationType"
          val enriched = eco.get(genes.trim) match {
            case Some(r) => data +
              ("type" -> r.recordType,
                "exonic_gene_sizes" -> r.exonicGeneSizes,
                "product" -> r.product)
            case None => data // "might be a promoter"
          }
          enriched + ("location" -> label, "gene_name" -> genes)
        }
      out += Row(withLoc, intervals)
    }

    def processBlock(buff: Seq[String]): Unit = {
      if (buff.isEmpty) return
      var data = Map.empty[String, String]
      var intervals = Seq.empty[(Int, Int)]
      var locationType = ""
      var genes = ""
      var direction: Option[Char] = None
      var directionMatched: Option[Char] = None
      buff.foreach { line =>
        val items = line.split("\t", -1)
        if (simKeys.contains(items(0)))
          data += items(0) -> items(1).replaceAll("^%+|%+$", "")
        else if (items(0) == "name") data += "name" -> items(1)
        else if (line.startsWith(">>>")) direction = Some('>')
        else if (line.startsWith("<<<")) direction = Some('<')
        else if (line.contains(" of ")) {
          val parts = line.split(" of ")
          if (parts.length == 2 && kinds.contains(parts(0))) {
            if (locationType != "")
              emit(data, intervals, locationType, genes, directionMatched, direction)
            locationType = parts(0)
            genes = parts(1)
          }
        } else if (line.startsWith("original direction"))
          directionMatched = Some(line.last)
        else if (line.startsWith(">NC"))
          data += "site" -> line.split("/").last
        else if (line.startsWith("(") && line.endsWith(")"))
          data += "index" -> line.substring(1, line.length - 1)
        else if (line.startsWith("match_format")) {
          val sequence = line.split("\\s+")(1).drop(1)
          // parity: the gate key is 'consistency', which the parser never
          // sets (it stores 'consistency_similarity') — dead by design
          val bestCnt = data.getOrElse("consistency", "10000").toInt
          var score = 0
          val iv = Vector.newBuilder[(Int, Int)]
          sequence.zipWithIndex.foreach { case (ch, idx) =>
            if (ch == '.') score = 0 else score += 1
            if (score == bestCnt) iv += ((idx + 2 - score, idx + 1))
          }
          intervals = iv.result()
        } else if (line.contains("target_format"))
          data += "target_sequence" -> line.substring(line.indexOf(':') + 1).trim
      }
      emit(data, intervals, locationType, genes, directionMatched, direction)
    }

    val buff = scala.collection.mutable.ArrayBuffer.empty[String]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.isEmpty) { processBlock(buff.toSeq); buff.clear() }
      else buff += line
    }
    processBlock(buff.toSeq)
    out.result()
  }

  /** `file-format` end-to-end: location-result text → padded TSV text. */
  def formatTsv(text: String, eco: Map[String, EcocycRecord]): String =
    render(parseLocationResult(text, eco))

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
