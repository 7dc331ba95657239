package graft.io

import EcocycHtml.{Data, EndTag, StartTag, tokenize}

/** S7 — the remaining scrape parsers (reference `html_parser_util.py:138-302`):
  * EcoCyc search-result URL lists, GO-term tables, KEGG ortholog id maps,
  * KEGG pathway tables. Pure `String => result`, fed from cached page
  * tables exactly like [[EcocycHtml]].
  */
object KeggHtml {

  /** `UrlHTMLParser`: every `<a href>` becomes `[href#tab=TU, id-or-object
    * param, linkText]` (reference `:138-170`).
    */
  def parseUrlList(html: String): Vector[(String, Option[String], String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Option[String], String)]
    tokenize(html).foreach {
      case StartTag("a", attrs) =>
        attrs.get("href").foreach { h =>
          val href = h.replace("&amp;", "&")
          out += ((href + "#tab=TU", extractNameFromData(href), ""))
        }
      case Data(raw) =>
        val data = raw.trim
        if (data.nonEmpty && out.nonEmpty) {
          val (a, b, c) = out.last
          out(out.length - 1) = (a, b, c + data)
        }
      case _ => ()
    }
    out.toVector
  }

  /** `id=`/`object=` param (reference `extract_name_from_data`). */
  def extractNameFromData(data: String): Option[String] = {
    data.split("['?&\"]").foreach { kv =>
      if (kv.indexOf('=') > 0) {
        val Array(k, v) = kv.split("=", 2)
        if (k == "id" || k == "object") return Some(v)
      }
    }
    None
  }

  /** `GoHTMLParser`: outer-table first-cell keys, inner-table second-cell
    * link values joined by commas (reference `:174-217`). The outer table
    * must carry a `class` attribute or the whole page is skipped.
    */
  def parseGoTable(html: String): Vector[(String, String)] = {
    var tbDepth = 0
    val tagStack = scala.collection.mutable.ArrayBuffer.empty[String]
    val trDepth = scala.collection.mutable.ArrayBuffer.empty[Int]
    val tdDepth = scala.collection.mutable.ArrayBuffer.empty[Int]
    val table = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    tokenize(html).foreach {
      case StartTag(tag, attrs) =>
        tagStack += tag
        tag match {
          case "table" =>
            tbDepth += 1
            trDepth += 0
            tdDepth += 0
            if (tbDepth == 1 && !attrs.contains("class")) tbDepth = 1000
          case "td" => if (tdDepth.nonEmpty) tdDepth(tdDepth.length - 1) += 1
          case "tr" =>
            if (trDepth.nonEmpty) {
              trDepth(trDepth.length - 1) += 1
              tdDepth(tdDepth.length - 1) = 0
            }
          case _ => ()
        }
      case EndTag(tag) =>
        if (tagStack.nonEmpty) tagStack.remove(tagStack.length - 1)
        if (tag == "table") {
          tbDepth -= 1
          if (trDepth.nonEmpty) trDepth.remove(trDepth.length - 1)
          if (tdDepth.nonEmpty) tdDepth.remove(tdDepth.length - 1)
          if (tbDepth == 0) tbDepth = 1000
        }
      case Data(data) =>
        if (tbDepth == 1 && tdDepth.nonEmpty && tdDepth.last == 1 &&
            tagStack.lastOption.contains("td")) {
          val cleaned = data.replaceAll("^\\s+", "").replaceAll("(\\s|:)+$", "")
          table += Array(cleaned, "")
        } else if (tbDepth == 2 && tdDepth.nonEmpty && tdDepth.last == 2 &&
            tagStack.lastOption.contains("a") && table.nonEmpty) {
          table.last(1) = (table.last(1) + "," + data.trim).replaceAll("^,+", "")
        }
    }
    table.map(a => (a(0), a(1))).toVector
  }

  /** `KeggIdHTMLParser`: after the "KEGG ORTHOLOGY" marker, link texts
    * starting with 'K' map to their hrefs (reference `:220-247`).
    */
  def parseKeggIdMap(html: String): Map[String, String] = {
    var started = false
    var lastHref: Option[String] = None
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    tokenize(html).foreach {
      case StartTag(tag, attrs) =>
        if (started) {
          if (tag == "a") lastHref = attrs.get("href")
          else lastHref = None
        }
      case Data(raw) =>
        val data = raw.trim
        if (data == "KEGG ORTHOLOGY") started = true
        else if (started && lastHref.isDefined && data.startsWith("K"))
          out(data) = lastHref.get
      case _ => ()
    }
    out.toMap
  }

  final case class KeggPathways(names: Vector[String], pathways: Vector[String])

  /** `KeggPathwayHTMLParser`: `<nobr>Name</nobr>` / `<nobr>Pathway</nobr>`
    * headers arm the following td; pathway fragments join per inner table
    * (reference `:249-302`).
    */
  def parseKeggPathways(html: String): KeggPathways = {
    var status = "NotStart"
    var depth = 0
    var lastTag = ""
    val names = Vector.newBuilder[String]
    val pathways = Vector.newBuilder[String]
    val current = scala.collection.mutable.ArrayBuffer.empty[String]
    tokenize(html).foreach {
      case StartTag(tag, _) =>
        lastTag = tag
        status match {
          case "StartPathway" if tag == "td" => status = "InTDPathway"; depth = 1
          case "StartName" if tag == "td"    => status = "InTDName"; depth = 1
          case "InTDPathway" | "InTDName" if tag == "td" => depth += 1
          case _ => ()
        }
      case EndTag(tag) =>
        status match {
          case "InTDPathway" =>
            if (tag == "td") {
              depth -= 1
              if (depth == 0) status = "NotStart"
            } else if (tag == "table") {
              require(current.nonEmpty, "pathway table closed with no content")
              pathways += current.mkString(" ")
              current.clear()
            }
          case "InTDName" if tag == "td" =>
            depth -= 1
            if (depth == 0) status = "NotStart"
          case _ => ()
        }
      case Data(raw) =>
        val data = raw.trim
        if (data.nonEmpty) {
          if (data == "Pathway" && lastTag == "nobr" && status == "NotStart")
            status = "StartPathway"
          else if (data == "Name" && lastTag == "nobr" && status == "NotStart")
            status = "StartName"
          else if (status == "InTDPathway") current += data
          else if (status == "InTDName") names ++= data.split(",").map(_.trim)
        }
    }
    KeggPathways(names.result(), pathways.result())
  }
}
