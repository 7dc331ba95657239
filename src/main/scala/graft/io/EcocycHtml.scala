package graft.io

/** S7 — EcoCyc gene-page scrape parsers (reference `EcocycHTMLParser`,
  * `src/utils/html_parser_util.py:48-136`): a SAX-style state machine over
  * HTML events extracting the gene attribute table (location, reaction,
  * map position, …), the resolved EcoCyc id, or the summary paragraph.
  *
  * Engine-parity scope per SURVEY S6/S7: parse already-cached pages (the
  * fetching connector is out of the query core). The parser is pure
  * (`String => result`) and runs inside `mapPartitions`/UDFs over a cache
  * table of page bodies.
  */
object EcocycHtml {

  private val IdScriptPrefix = "window.location.replace('/gene?"

  /** `[a -> b]` / `[b <- a]` map-position cell → (start, end) (reference
    * `extract_map_position`, `html_parser_util.py:14-23`).
    */
  def extractMapPosition(data: String): (Int, Int) = {
    val inner = data.substring(data.indexOf('[') + 1, data.indexOf(']'))
    val (start, end) =
      if (inner.indexOf("<-") > 0) { val Array(e, s) = inner.split("<-"); (s, e) }
      else { val Array(s, e) = inner.split("->"); (s, e) }
    (start.trim.replace(",", "").toInt, end.trim.replace(",", "").toInt)
  }

  /** Strip `<i>`-style simple tags from a gene name (reference
    * `extract_gene_name`).
    */
  def extractGeneName(data: String): String = data.replaceAll("<\\w+>", "")

  /** `gene:'EGxxxx'` inside a typeObjectPage script (reference
    * `extract_id_from_script`).
    */
  def extractIdFromScript(data: String): Option[String] = {
    val i = data.indexOf("gene:'")
    if (i < 0) None
    else {
      val start = i + 6
      Some(data.substring(start, data.indexOf('\'', start)))
    }
  }

  /** `id=` param from an href/script blob split on `' ? & "` (reference
    * `extract_id_from_data`).
    */
  def extractIdFromData(data: String): Option[String] = {
    data.split("['?&\"]").foreach { kv =>
      if (kv.indexOf('=') > 0) {
        val Array(k, v) = kv.split("=", 2)
        if (k == "id") return Some(v)
      }
    }
    None
  }

  // ------------------------------------------------------------ tokenizer

  sealed trait Event
  final case class StartTag(name: String, attrs: Map[String, String]) extends Event
  final case class EndTag(name: String) extends Event
  final case class Data(text: String) extends Event

  private val attrRe = """([\w-]+)\s*=\s*("([^"]*)"|'([^']*)')""".r

  /** Minimal well-formed-HTML tokenizer: start/end tags with quoted
    * attributes, script bodies as one data run (matching the Python
    * HTMLParser CDATA behavior our fixtures rely on).
    */
  def tokenize(html: String): Vector[Event] = {
    val out = Vector.newBuilder[Event]
    var i = 0
    // '<' only opens a tag when followed by a letter or '/': a bare '<'
    // (e.g. the '<-' arrows in EcoCyc map positions) is literal data,
    // matching Python HTMLParser's recovery behavior
    def tagStartFrom(from: Int): Int = {
      var p = html.indexOf('<', from)
      while (p >= 0 && p + 1 < html.length &&
             !html.charAt(p + 1).isLetter && html.charAt(p + 1) != '/') {
        p = html.indexOf('<', p + 1)
      }
      if (p >= 0 && p + 1 >= html.length) -1 else p
    }
    while (i < html.length) {
      val lt = tagStartFrom(i)
      if (lt < 0) {
        out += Data(html.substring(i))
        i = html.length
      } else {
        if (lt > i) out += Data(html.substring(i, lt))
        val gt = html.indexOf('>', lt)
        if (gt < 0) i = html.length
        else {
          val raw = html.substring(lt + 1, gt)
          if (raw.startsWith("/")) {
            out += EndTag(raw.substring(1).trim.toLowerCase)
            i = gt + 1
          } else {
            val name = raw.takeWhile(c => !c.isWhitespace && c != '/').toLowerCase
            val attrs = attrRe.findAllMatchIn(raw).map { m =>
              m.group(1).toLowerCase -> Option(m.group(3)).getOrElse(m.group(4))
            }.toMap
            out += StartTag(name, attrs)
            if (name == "script") {
              // CDATA mode: script body is one data run (Python HTMLParser)
              val end = html.indexOf("</script>", gt)
              val stop = if (end < 0) html.length else end
              if (stop > gt + 1) out += Data(html.substring(gt + 1, stop))
              out += EndTag("script")
              i = if (end < 0) html.length else end + "</script>".length
            } else i = gt + 1
          }
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------- attr-table extraction

  final case class ParseResult(
      attributes: Map[String, String],
      mapPosition: Option[(Int, Int)],
      ecocycId: Option[String],
      summary: Option[String])

  private val attrKeys = Set("location", "reaction", "gene", "enzyme", "rna",
    "protein", "polypeptide", "function when intact", "transporter",
    "map position", "summary")

  /** The td-depth state machine (reference `handle_starttag`/`handle_endtag`/
    * `handle_data`, `html_parser_util.py:66-136`): a td whose text is an
    * attribute key arms collection at that depth; nested td content
    * accumulates; the matching end-td at lower depth seals the value
    * ("map position" additionally parses to coordinates); `<a>` runs inside
    * "reaction" append a `__#####__` separator. Modes: attribute table
    * (default), id resolution, summary extraction.
    */
  def parse(
      html: String,
      extractId: Boolean = false,
      geneName: String = null,
      extractSummary: Boolean = false): ParseResult = {
    val inf = 1000000
    var depth = 0
    var fillDepth = -inf
    var lastTdData: String = null
    var lastTag = ""
    var lastAData: String = null
    var lastEcocycId: Option[String] = None
    var ecocycId: Option[String] = None
    var summaryStep = "not_start"
    val attrs = scala.collection.mutable.Map.empty[String, String]
    var mapPos: Option[(Int, Int)] = None

    tokenize(html).foreach {
      case StartTag(tag, tagAttrs) =>
        lastTag = tag
        if (tag == "a") lastAData = ""
        if (tag == "td") depth += 1
        if (tag == "a" && extractId) {
          tagAttrs.get("href").foreach { href =>
            if (href.startsWith("/gene?orgid=ECOLI&id="))
              lastEcocycId = extractIdFromData(href)
          }
        }
        if (tag == "p" && extractSummary && summaryStep == "start" &&
            tagAttrs.get("class").contains("ecoparagraph"))
          summaryStep = "end"

      case EndTag(tag) =>
        if (tag == "td") {
          depth -= 1
          if (depth < fillDepth && lastTdData != null) {
            if (attrs.getOrElse(lastTdData, "") != "") {
              if (lastTdData == "map position")
                mapPos = Some(extractMapPosition(attrs(lastTdData)))
              fillDepth = -inf
              lastTdData = null
            }
          }
        } else if (tag == "a") {
          if (lastTdData == "reaction" && attrs.getOrElse("reaction", "") != "")
            attrs("reaction") = attrs("reaction") + "__#####__"
          if (extractId && lastEcocycId.isDefined) {
            if (extractGeneName(Option(lastAData).getOrElse("")) == geneName)
              ecocycId = lastEcocycId
            else lastEcocycId = None
          }
          lastAData = null
        }

      case Data(raw) =>
        var data = raw.trim
        if (lastAData != null) lastAData += data
        if (data == "Locations" || data == "Reactions") data = data.dropRight(1)
        if (extractSummary) {
          if (summaryStep == "not_start" && data == "Summary" && lastTag == "h3") {
            attrs("summary") = ""
            summaryStep = "start"
          } else if (summaryStep == "start" && data.nonEmpty)
            attrs("summary") = attrs.getOrElse("summary", "") + data
        } else if (extractId) {
          if (lastTag == "script" && data.startsWith(IdScriptPrefix))
            ecocycId = extractIdFromData(data.substring(IdScriptPrefix.length))
        } else if (data.nonEmpty) {
          if (lastTdData != null && attrKeys.contains(lastTdData))
            attrs(lastTdData) = attrs.getOrElse(lastTdData, "") + data
          if (lastTag == "td" && fillDepth == -inf) {
            val key = data.toLowerCase
            if (attrKeys.contains(key)) {
              lastTdData = key
              fillDepth = depth
              attrs(key) = ""
            }
          }
          if (data.indexOf("typeObjectPage") > 0)
            ecocycId = extractIdFromScript(data)
        }
    }
    ParseResult(attrs.toMap.filter(_._2.nonEmpty), mapPos, ecocycId,
      attrs.get("summary").filter(_.nonEmpty))
  }
}
