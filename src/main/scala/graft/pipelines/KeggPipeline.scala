package graft.pipelines

import graft.io.KeggHtml

/** Pipeline — KEGG ortholog/pathway expansion in cache mode (reference
  * `KeggAnalysis`, `kegg_analysis.py:31-108`; SURVEY G5): gene →
  * ortholog ids (cached search page) → pathways per id (cached entry
  * page), the two-level explode. Failures route to the error output like
  * the reference; the pool parallelism maps to a Dataset `flatMap` when
  * run distributed (each gene is independent).
  */
object KeggPipeline {

  /** gene mode: rows `gene\tkegg_id\tp1; p2...` per ortholog id.
    * Returns (resultText, errorText).
    */
  def runForGenes(
      genes: Seq[String],
      cache: String => Option[String]): (String, String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    genes.foreach { gene =>
      val rows = for {
        page <- cache(s"get_kegg_id_$gene.html").toRight(gene).toOption
        ids = KeggHtml.parseKeggIdMap(page).keys.toVector
        if ids.nonEmpty
      } yield ids.flatMap { keggId =>
        cache(s"get_pathway_$keggId.html").map { p =>
          val parsed = KeggHtml.parseKeggPathways(p)
          s"$gene\t$keggId\t${parsed.pathways.mkString("; ")}"
        }
      }
      rows match {
        case Some(lines) if lines.nonEmpty =>
          out.append(lines.mkString("\n")).append('\n')
        case _ => err.append(gene).append('\n')
      }
    }
    (out.toString, err.toString)
  }

  /** kegg-id mode: rows `kegg_id\tname\tp1; p2...` per parsed name. */
  def runForKeggIds(
      ids: Seq[String],
      cache: String => Option[String]): (String, String) = {
    val out = new StringBuilder
    val err = new StringBuilder
    ids.foreach { keggId =>
      cache(s"get_pathway_$keggId.html") match {
        case Some(p) =>
          val parsed = KeggHtml.parseKeggPathways(p)
          val lines = parsed.names.map(n => s"$keggId\t$n\t${parsed.pathways.mkString("; ")}")
          if (lines.nonEmpty) out.append(lines.mkString("\n")).append('\n')
          else err.append(keggId).append('\n')
        case None => err.append(keggId).append('\n')
      }
    }
    (out.toString, err.toString)
  }
}
