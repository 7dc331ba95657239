package graft.pipelines

/** Pipeline — PubMed search-count extraction in cache mode (reference
  * `run_search_count.py`): per gene × keyword, parse the cached result
  * page for the results-amount marker and emit the count table. Parser
  * semantics preserved exactly: the line AFTER the marker div carries the
  * count (span tags stripped), "No results were found" → "0", marker
  * absent → "1" (single-result pages redirect and lose the marker),
  * missing/empty cache → "Error".
  */
object SearchCountPipeline {

  val defaultKeywords: Seq[String] =
    Seq("drug", "Kanamycin+B", "aminoglycoside", "antibiotic", "biofilm")

  /** reference `extract_result_info`. */
  def extractResultInfo(body: String): String = {
    var step = -1
    body.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line == "<div class=\"results-amount\">") step = 0
      else if (step == 0 && line.nonEmpty) {
        return if (line.contains("No results were found")) "0"
        else line.replace("<span class=\"value\">", "").replace("</span>", "")
      }
    }
    "1"
  }

  /** Emit the `gene\tcount...` table over a cache of page bodies keyed
    * `<gene>_<keyword with + → _>.html`.
    */
  def run(
      genes: Seq[String],
      cache: String => Option[String],
      keywords: Seq[String] = defaultKeywords): String = {
    val sb = new StringBuilder(("gene" +: keywords).mkString("\t") + "\n")
    genes.map(_.trim).filter(_.nonEmpty).foreach { gene =>
      val counts = keywords.map { kw =>
        val key = kw.replace("+", "_")
        cache(s"${gene}_$key.html").filter(_.trim.nonEmpty) match {
          case Some(body) => extractResultInfo(body)
          case None       => "Error"
        }
      }
      sb.append((gene +: counts).mkString("\t")).append('\n')
    }
    sb.toString
  }
}
