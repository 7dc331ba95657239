package graft.pipelines

import graft.bio.{GeneTU, PromoterWalk}
import graft.io.EcocycHtml

/** Pipeline — EcoCyc enrichment in cache mode (reference `EcocycAnalysis
  * .work_from_gene_list_file`, SURVEY §3.3): per gene row of a
  * dynamic-header TSV, resolve the EcoCyc id from the cached gene page,
  * pull attributes from the cached TU page, walk the cached promoter
  * diagram for the best promoter, and re-render the row in header order
  * with the derived product/status/promoter columns. Failures emit a
  * `gene\tNot Found` row plus an error-file line, exactly like the
  * reference; fetching is a connector concern — the cache IS the input.
  */
object EcocycEnrichPipeline {

  final case class Config(
      outputBestPromoter: Boolean = true,
      analysisPromoter: Boolean = true,
      getSummary: Boolean = false,
      getGoTable: Boolean = false)

  /** `cache(fileName)` returns the cached page body (e.g.
    * `gene_araC.html`, `tu_EG10284.html`, `promoter_EG10284.json`).
    */
  def run(
      inputTsv: String,
      cache: String => Option[String],
      cfg: Config = Config()): (String, String) = {
    val lines = inputTsv.linesIterator.filter(_.trim.nonEmpty).toVector
    val headerLine = lines.head
    val headers = headerLine.trim.split("\t").toVector
    val result = new StringBuilder(headerLine + "\n")
    val errors = new StringBuilder

    lines.tail.foreach { line =>
      val row = scala.collection.mutable.Map.empty[String, String]
      var tableUnites: Option[Either[Unit, (Int, GeneTU)]] = None // Left=Not Found
      val infos = line.trim.split("\t")
      infos.zipWithIndex.foreach { case (v, i) => if (i < headers.length) row(headers(i)) = v }
      var geneName = row.getOrElse("gene", "")
      try {
        if (geneName.indexOf("->") > 0) {
          val Array(g, rest) = geneName.split("->", 2)
          geneName = g
          row("gene") = rest
        }
        val genePage = cache(s"gene_$geneName.html")
          .getOrElse(throw new RuntimeException(s"missing gene page for $geneName"))
        val ecocycId = EcocycHtml.parse(genePage, extractId = true, geneName = geneName)
          .ecocycId.getOrElse(throw new RuntimeException(s"Ecocyc id is None for $geneName"))
        row("ecocyc_id") = ecocycId

        val tuPage = cache(s"tu_$ecocycId.html")
          .getOrElse(throw new RuntimeException(s"missing tu page for $ecocycId"))
        val parsed = EcocycHtml.parse(tuPage)
        parsed.mapPosition.foreach { case (s, e) =>
          row("map_start_pos") = s.toString
          row("map_end_pos") = e.toString
        }
        parsed.attributes.foreach { case (k, v) =>
          if (k != "map position") row(k) = stripSeparator(v)
        }

        if (cfg.getSummary) {
          cache(s"summary_$ecocycId.html").foreach { p =>
            row("summary") = EcocycHtml.parse(p, extractSummary = true).summary.getOrElse("")
          }
        }
        if (cfg.analysisPromoter) {
          cache(s"promoter_$ecocycId.json").foreach { body =>
            tableUnites = Some(analyzePromoters(body, row.getOrElse("gene", geneName), cfg))
          }
        }
        if (cfg.getGoTable) {
          cache(s"go_$ecocycId.html").foreach { p =>
            row("go") = graft.io.KeggHtml.parseGoTable(p)
              .map { case (k, v) => s"$k=$v" }.mkString(";")
          }
        }
        if (row.getOrElse("gene", "") != geneName)
          row("gene") = geneName + "->" + row("gene")
        result.append(extractOutput(headers, row, tableUnites)).append('\n')
      } catch {
        case _: Exception =>
          result.append(s"${row.getOrElse("gene", geneName)}\tNot Found\n")
          errors.append(geneName).append('\n')
      }
    }
    (result.toString, errors.toString)
  }

  /** `.strip('__#####__')` is a CHARACTER-SET strip in the reference —
    * leading/trailing '_' and '#' runs drop, interior separators stay.
    */
  private def stripSeparator(v: String): String =
    v.dropWhile(c => c == '_' || c == '#').reverse.dropWhile(c => c == '_' || c == '#').reverse

  /** reference `analysis_json`: best-promoter mode walks the TU diagram
    * for the target gene; Right((nearGenePos, promoter)) on success.
    */
  private def analyzePromoters(
      jsonBody: String,
      geneName: String,
      cfg: Config): Either[Unit, (Int, GeneTU)] = {
    val links = parseLinks(jsonBody)
    val tus = links.map(PromoterWalk.fromLink)
    if (cfg.outputBestPromoter) {
      tus.find(_.isGene(geneName)) match {
        case Some(target) =>
          PromoterWalk.targetPromoter(target, tus) match {
            case (Some(p), Some(pos)) => Right((pos, p))
            case _ => Left(())
          }
        case None => Left(())
      }
    } else Left(())
  }

  /** Minimal JSON `links` array reader (shape: `{"links": [[...], ...]}`,
    * values are numbers or strings — matches [[PromoterWalk.readTuJson]]'s
    * all-string schema without needing a SparkSession).
    */
  private[pipelines] def parseLinks(body: String): Vector[Vector[String]] = {
    val start = body.indexOf("[", body.indexOf("\"links\""))
    var i = start + 1
    var depth = 1
    val rows = Vector.newBuilder[Vector[String]]
    var current = Vector.newBuilder[String]
    val sb = new StringBuilder
    var inString = false
    def flushValue(): Unit = {
      val v = sb.toString.trim
      if (v.nonEmpty) current += v
      sb.clear()
    }
    while (i < body.length && depth > 0) {
      val c = body.charAt(i)
      if (inString) {
        if (c == '"') inString = false else sb.append(c)
      } else c match {
        case '"' => inString = true
        case '[' => depth += 1; current = Vector.newBuilder[String]
        case ']' =>
          depth -= 1
          if (depth == 1) { flushValue(); rows += current.result() }
        case ',' => flushValue()
        case _ => sb.append(c)
      }
      i += 1
    }
    rows.result()
  }

  /** reference `extract_output`: derive product_type/product from the LAST
    * non-empty product key; fill status/promoter columns from the walk.
    */
  private def extractOutput(
      headers: Vector[String],
      row: scala.collection.mutable.Map[String, String],
      tableUnites: Option[Either[Unit, (Int, GeneTU)]]): String = {
    headers.map { name =>
      if (name == "product_type") {
        for (key <- Seq("enzyme", "rna", "protein", "polypeptide", "function when intact", "transporter"))
          if (row.getOrElse(key, "").nonEmpty) {
            row("product_type") = key
            row("product") = row(key)
          }
      } else if (row.getOrElse(name, "").isEmpty || row.get(name).contains("Not Found")) {
        if (Seq("status", "promoter_name", "promoter_pos", "gene_start_pos").contains(name)) {
          tableUnites match {
            case Some(Left(())) =>
              if (name == "status") row("status") = "Not Found"
            case Some(Right((pos, promoter))) =>
              row("status") = "Found"
              row("gene_start_pos") = pos.toString
              row("promoter_name") = promoter.promoterName.getOrElse("")
              row("promoter_pos") = promoter.promoterStartSite.map(_.toString).getOrElse("")
            case None => ()
          }
        }
      }
      row.getOrElse(name, "")
    }.mkString("\t")
  }
}
