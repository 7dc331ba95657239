package graft.pipelines

/** Pipeline — ordered index reorder (reference `LocationReorder`,
  * `location_reorder.py:18-45`): the index file's order drives the output;
  * blocks are keyed by their `(idx)` marker line. Missing indexes warn and
  * are skipped (the reference would crash iterating None — fixed, not
  * copied).
  */
object LocationReorder {

  /** Key every `(n)`-headed block (reference `read_all_location`). */
  def readBlocks(locationText: String): Map[String, Vector[String]] = {
    val data = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    val buff = scala.collection.mutable.ArrayBuffer.empty[String]
    var lastIndex: String = null
    locationText.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty) {
        if (line.startsWith("(") && line.endsWith(")")) {
          if (buff.nonEmpty && lastIndex != null) {
            data(lastIndex) = buff.toVector
            buff.clear()
          }
          lastIndex = line
        }
        buff += line
      }
    }
    if (buff.nonEmpty && lastIndex != null) data(lastIndex) = buff.toVector
    data.toMap
  }

  /** Reorder by the index file; returns (text, missing indexes). */
  def run(locationText: String, indexLines: Seq[String]): (String, Seq[String]) = {
    val data = readBlocks(locationText)
    val out = new StringBuilder
    val missing = Seq.newBuilder[String]
    indexLines.map(_.trim).filter(_.nonEmpty).foreach { index =>
      data.get(index).orElse(data.get(s"($index)")) match {
        case Some(block) =>
          block.foreach(l => out.append(l).append('\n'))
          out.append('\n')
        case None => missing += index
      }
    }
    (out.toString, missing.result())
  }
}
