package graft.bio

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One element of an EcoCyc transcription-unit diagram (reference
  * `GeneTUInfo`, `src/utils/gene_promoter_util.py:4-85`): a positioned box
  * with an HTML attribute blob parsed into a key→value map.
  */
final case class GeneTU(
    idx: Int,
    link: String,
    left: Int,
    top: Int,
    right: Int,
    bottom: Int,
    attributes: Map[String, String]) {

  def isGene(name: String = null): Boolean =
    if (name == null) attributes.contains("Gene")
    else attributes.getOrElse("Gene", "").split("\\s+").contains(name)

  def isPromoter(checkStartSite: Boolean = false): Boolean =
    if (checkStartSite) attributes.contains("Promoter") && attributes.contains("Tr.Start site")
    else attributes.contains("Promoter")

  def promoterName: Option[String] = attributes.get("Promoter")

  def promoterStartSite: Option[Int] =
    attributes.get("Tr.Start site").map(_.replace(",", "").toInt)

  /** Location "a -> b" / "b <- a": the transcription START (reference
    * `get_gene_start_position`).
    */
  def geneStartPosition: Int = {
    val Array(a, op, b) = attributes("Location").split("\\s+")
    if (op == "<-") b.replace(",", "").toInt else a.replace(",", "").toInt
  }

  def direction: String = {
    val loc = attributes("Location")
    if (loc.indexOf("<-") > 0) "Left"
    else if (loc.indexOf("->") > 0) "Right"
    else throw new IllegalStateException("Get direction of gene failed")
  }
}

/** J9 — the "promoter upstream after the last gene" walk over a TU diagram
  * (reference `get_target_promoter`, `gene_promoter_util.py:141-167`) plus
  * the JSON `links` parser (`ecocyc_analysis.py:300-324`).
  *
  * Per-TU element counts are dozens — the distributed form groups diagram
  * rows per TU and walks each group locally (`collect_list` + walk), the
  * right plan for many-TUs × small-TU data.
  */
object PromoterWalk {

  /** Parse the attribute blob: drop bold tags, split on `<BR>`/`<br>`,
    * `k: v` pairs; an unparseable blob lands under "Body" (reference
    * `parse_attributes`, `gene_promoter_util.py:71-85`).
    */
  def parseAttributes(attrStr: String): Map[String, String] = {
    val clean = attrStr.replaceAll("<b>|</b>", "")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    clean.split("<BR>|<br>").foreach { line =>
      val i = line.indexOf(':')
      if (i >= 0) out(line.substring(0, i).trim) = line.substring(i + 1).trim
    }
    if (out.isEmpty) Map("Body" -> attrStr) else out.toMap
  }

  def fromLink(items: Seq[String]): GeneTU = {
    require(items.length == 7, "items size in table unit not correct")
    GeneTU(items(0).toDouble.toInt, items(1),
      items(2).toDouble.toInt, items(3).toDouble.toInt,
      items(4).toDouble.toInt, items(5).toDouble.toInt,
      parseAttributes(items(6)))
  }

  def allPromoters(tus: Seq[GeneTU], checkStartSite: Boolean = false): Seq[GeneTU] =
    tus.filter(_.isPromoter(checkStartSite))

  def allGenes(tus: Seq[GeneTU], direction: Option[String] = None): Seq[GeneTU] =
    tus.filter(t => t.isGene() && direction.forall(_ == t.direction))

  /** Promoters drawn at or above the gene's row (reference
    * `filter_same_direction` — the name lies, it filters by `top`).
    */
  def filterSameDirection(gene: GeneTU, tus: Seq[GeneTU]): Seq[GeneTU] =
    tus.filter(_.top <= gene.top)

  /** The walk: sort genes (same direction) + promoters (with start sites,
    * same row band) by `pos*10 + isGene` where pos is left (Right
    * direction) or right (Left); walk toward the target gene keeping the
    * last promoter seen since the previous gene run started; at the
    * target, return (that promoter, first gene-run start position).
    */
  def targetPromoter(target: GeneTU, tus: Seq[GeneTU]): (Option[GeneTU], Option[Int]) = {
    val direction = target.direction
    val genes = allGenes(tus, Some(direction))
    val promoters = filterSameDirection(target, allPromoters(tus, checkStartSite = true))
    val ls = (genes ++ promoters).sortBy { t =>
      (if (direction == "Right") t.left else t.right) * 10 + (if (t.isGene()) 1 else 0)
    }
    val add = if (direction == "Right") 1 else -1
    var idx = if (direction == "Right") 0 else ls.length - 1
    var lastPromoter: Option[GeneTU] = None
    var geneAppears = false
    var nearGenePos: Option[Int] = None
    while (idx >= 0 && idx < ls.length) {
      val item = ls(idx)
      if (item.isGene()) {
        if (!geneAppears) {
          geneAppears = true
          nearGenePos = Some(item.geneStartPosition)
        }
        if (item.idx == target.idx) return (lastPromoter, nearGenePos)
      } else if (item.isPromoter()) {
        if (geneAppears || lastPromoter.isEmpty) {
          lastPromoter = Some(item)
          geneAppears = false
        }
      }
      idx += add
    }
    (None, None)
  }

  /** Spark reader for the TU diagram JSON (`{"links": [[idx, href, l, t,
    * r, b, attrHtml], ...]}`): heterogeneous JSON arrays read under an
    * all-string schema. One row per diagram file → Dataset[GeneTU] tagged
    * by file.
    */
  def readTuJson(spark: SparkSession, path: String): Dataset[(String, Seq[GeneTU])] = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("links", ArrayType(ArrayType(StringType)))))
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("file"), from_json(col("value"), schema).as("j"))
      .select(col("file"), col("j.links").as("links"))
      .as[(String, Seq[Seq[String]])]
      .map { case (f, links) => (f, links.map(fromLink)) }
  }
}
