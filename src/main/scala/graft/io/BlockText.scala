package graft.io

/** D8 — the reference's block-structured text interchange format. In this
  * engine stages exchange Datasets natively; block-text is an import/export
  * codec only (SURVEY D8 decision).
  *
  * Writer: reference `gene_similarity_match.py:111-155` (K1).
  * Reader: reference `gene_location_analysis.py:41-54` + `parse_similarity_data`
  * (`:242-264`) (S5).
  */
final case class SimilarityBlock(
    fileInfo: String,
    start: Int,
    end: Int,
    header: String,          // "file/start-end"
    matchInfo: String,       // newline-joined k\tv / k v lines
    direction: String,       // ">>>>>>>>>>" | "<<<<<<<<<<"
    additional: Vector[String])

object BlockText {

  /** K1 — render one match block:
    * `(idx)\n>dataName/start-end\tk=v,...,track=...\n\n`.
    */
  def renderMatchBlock(
      idx: Int,
      dataName: String,
      start: Int,
      end: Int,
      attributes: Seq[(String, String)],
      sequences: Seq[(String, String)]): String = {
    val attrPart = attributes.map { case (k, v) => s"$k=$v" }.mkString(",")
    val seqPart = sequences.map { case (k, v) => s"$k=$v" }.mkString(",")
    s"($idx)\n>$dataName/$start-$end\t$attrPart,$seqPart\n\n"
  }

  /** S5 — assemble `>NC`-delimited blocks, skipping blanks and `(n)` index
    * markers (reference `gene_location_analysis.py:41-54`).
    */
  def blocks(text: String): Vector[Vector[String]] = {
    val out = Vector.newBuilder[Vector[String]]
    val buff = scala.collection.mutable.ArrayBuffer.empty[String]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !(line.startsWith("(") && line.endsWith(")"))) {
        if (line.startsWith(">NC") && buff.nonEmpty) {
          out += buff.toVector
          buff.clear()
        }
        buff += line
      }
    }
    if (buff.nonEmpty) out += buff.toVector
    out.result()
  }

  /** Parse one assembled block (reference `parse_similarity_data`,
    * `gene_location_analysis.py:242-264`): header `file/start-end\tk=v,...`;
    * `direction=±` is dropped; keys containing ':' join their value without
    * a tab (they are the render tracks).
    *
    * QUIRK PRESERVED: the reference derives the direction track by
    * comparing start/end as STRINGS (`'>' if start < end else '<'` runs
    * before the int() casts, `gene_location_analysis.py:262`), so e.g.
    * '1012' < '998' is TRUE lexicographically and renders '>' for a
    * reverse hit. Downstream sense/antisense labeling consumes this line,
    * so byte parity requires the string comparison.
    */
  def parseSimilarityBlock(buff: Vector[String]): SimilarityBlock = {
    val Array(primary, matchRaw) = buff.head.split("\t", 2)
    val slash = primary.lastIndexOf('/')
    val fileInfo = primary.substring(0, slash)
    val Array(s, e) = primary.substring(slash + 1).split("-")
    val start = s.toInt
    val end = e.toInt
    val cleaned = matchRaw.replaceAll("direction=(\\+|-),", "")
    val lines = cleaned.split(",").toVector.map { kv =>
      val i = kv.indexOf('=')
      val (k, v) = (kv.substring(0, i), kv.substring(i + 1))
      if (k.contains(":")) k + v else k + "\t" + v
    }
    SimilarityBlock(
      fileInfo, start, end,
      header = s"$fileInfo/$start-$end",
      matchInfo = lines.mkString("\n"),
      direction = (if (s < e) ">" else "<") * 10, // STRING comparison — see scaladoc
      additional = buff.tail)
  }
}
