package graft.pipelines

import graft.bio.{Dna, GeneOps}
import graft.io.{GenBank, GenBankFile}

/** Pipeline — neighbor analysis in cache mode (reference
  * `NeighborAnalysis`, SURVEY §3.2 step 2): for each `>key/a-b` request,
  * read the cached GenBank file, probe nearest/covering segments (J2),
  * render the neighbor block; then the next-gene pass (J3) and the
  * source/gene distribution counts (A1). Live fetching is a connector
  * concern kept outside the engine (SURVEY S6 decision) — the cache
  * directory IS the interface.
  */
object NeighborPipeline {

  final case class Request(key: String, left: Int, right: Int, additional: String)

  /** `>key/a-b[\tk=v,...]` (reference `DataDownloadTool.format_data`). */
  def parseRequest(line: String): Request = {
    val items = line.stripLineEnd.split("\t")
    val (data, additional) = if (items.length == 2) (items(0), items(1)) else (line.stripLineEnd, "")
    val Array(key, inter) = data.substring(1).trim.split("/")
    val Array(a, b) = inter.split("-").map(_.toInt)
    Request(key, a, b, additional)
  }

  /** One neighbor block (reference `find_neighbor_batch` render +
    * `analysis_download_file`): SOURCE line, the probed segment set
    * (covering + nearest flank each side, reference's `str(segment)`
    * format `left-right\tproduct|UNKNOWN`), and the strand-aware request
    * sequence. The reference accumulates segments in a PYTHON SET whose
    * iteration order is hash-randomized — we emit them sorted by
    * (left, right) and compare set-wise in tests.
    */
  def renderBlock(req: Request, gb: GenBankFile): String = {
    val left = math.min(req.left, req.right)
    val right = math.max(req.left, req.right)
    val (up, down, covering) = GeneOps.neighborProbe(gb.segments, left, right)
    val entries = (covering.map(segStr) ++ up.map(segStr) ++ down.map(segStr)).distinct
      .sortBy(identity)
    var sequence = gb.dna.substring(left - 1, right)
    if (req.left > req.right) sequence = Dna.reverseComplement(sequence)
    val direction = if (req.left < req.right) "+" else "-"
    val sb = new StringBuilder
    sb.append(s">${req.key}/${req.left}-${req.right}($direction)\n")
    if (req.additional.nonEmpty)
      req.additional.split(",").foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        sb.append(s"$k\t$v\n")
      }
    sb.append(s"SOURCE\t${gb.source.getOrElse("UNKNOWN")}\n")
    entries.foreach(e => sb.append(e).append('\n'))
    sb.append(s"sequence\t$sequence\n\n")
    sb.toString
  }

  private def segStr(s: graft.io.GeneSegment): String =
    s"${s.left}-${s.right}\t${s.product.getOrElse("UNKNOWN")}"

  /** Run over a cache: requests + a loader from key → GenBank text.
    * Returns (neighborResult, nextGeneResult, sourceCounts, geneCounts).
    *
    * QUIRKS PRESERVED from the reference's next-gene pass
    * (`source_gene_distribution_analysis` re-parses its OWN output,
    * `neighbor_analysis.py:96-118`): the J3 candidates are only the
    * probed block entries — not all segments — and the "gene" field is
    * actually the rendered PRODUCT string (`str(segment)` writes
    * `left-right\tproduct`, and `read_gene` takes field 2 as the name).
    */
  def run(
      requests: Seq[Request],
      cache: String => Option[String],
      keepPrefixNum: Int = 1): (String, String, String, String) = {
    val neighbor = new StringBuilder
    val parsed = requests.flatMap { req =>
      cache(req.key).map(GenBank.parse(_)).filter(_.dna.nonEmpty).map { gb =>
        neighbor.append(renderBlock(req, gb))
        (req, gb)
      }
    }

    val (nextGene, sourceCounts, geneCounts) =
      nextGenePass(neighbor.toString, keepPrefixNum)
    (neighbor.toString, nextGene, sourceCounts, geneCounts)
  }

  /** The next-gene pass — a faithful RE-PARSE of the neighbor report,
    * exactly like the reference (`source_gene_distribution_analysis` +
    * `extract_data`, `neighbor_analysis.py:96-155`), quirks included:
    * line 2 is assumed to be SOURCE, so blocks carrying additional `k=v`
    * lines feed the first value (e.g. a score) into the source counter;
    * candidate "gene" names are the rendered product strings; the pct
    * denominator is ALL parsed blocks, matched or not.
    */
  def nextGenePass(neighborText: String, keepPrefixNum: Int): (String, String, String) = {
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
    val buff = scala.collection.mutable.ArrayBuffer.empty[String]
    neighborText.linesIterator.foreach { line =>
      if (line.trim.isEmpty) {
        if (buff.nonEmpty) { blocks += buff.toVector; buff.clear() }
      } else buff += line.trim
    }
    if (buff.nonEmpty) blocks += buff.toVector

    val out = new StringBuilder
    val sourceCounts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val geneCounts = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    blocks.foreach { b =>
      val head = b.head.substring(1)
      val Array(name, inter) = head.split("/")
      val direction = inter.charAt(inter.length - 2)
      val Array(l, r) = inter.dropRight(3).split("-").map(_.toInt)
      val source = prefixOf(b(1).split("\t", 2).last, keepPrefixNum)
      val candidates = b.drop(2).flatMap { line =>
        try {
          val Array(iv, gene) = line.split("\t")
          val Array(gl, gr) = iv.split("-").map(_.toInt)
          Some((gene, gl, gr))
        } catch { case _: Exception => None }
      }
      GeneOps.pickNextGene(l, r, direction, candidates).foreach { case (gene, gl, gr) =>
        out.append(s">$name/$l-$r($direction)\n")
        out.append(s"SOURCE\t$source\n")
        out.append(s"$gl-$gr\t$gene\n\n")
        sourceCounts(source) = sourceCounts.getOrElse(source, 0) + 1
        geneCounts(gene) = geneCounts.getOrElse(gene, 0) + 1
      }
    }
    val total = blocks.size
    def renderCounts(counts: scala.collection.mutable.LinkedHashMap[String, Int]): String =
      counts.toSeq.sortBy { case (k, v) => (-v, k) }
        .map { case (k, v) => f"$k\t$v\t${v * 100.0 / math.max(total, 1)}%.4f%%" }
        .mkString("", "\n", if (counts.nonEmpty) "\n" else "")
    (out.toString, renderCounts(sourceCounts), renderCounts(geneCounts))
  }

  private def prefixOf(source: String, n: Int): String =
    if (n > 0) source.trim.split("\\s+").take(n).mkString(" ") else source
}
