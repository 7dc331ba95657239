package graft.bio

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One aligned track inside an fna block: `name start <seq...> end`, with
  * bare continuation lines appended to the sequence (reference
  * `cluster_match.py:149-171` `update_sequence`).
  */
final case class FnaTrack(name: String, start: Int, end: Int, seq: String)

/** One `>>`-delimited block: 4 meta lines (header, 2 free lines, the
  * `(geneNo) ?|!` marker), then 3 tracks (query / target / result).
  */
final case class FnaBlock(
    index: Int,
    geneNo: String,
    others: Vector[String],
    tracks: Vector[FnaTrack])

/** The cluster-match pipeline (reference `cluster_match.py`, SURVEY §3.2
  * step 1): parse fna blocks → cluster by case-insensitive TARGET-track
  * equality → emit cluster sizes, representatives, all members, and the
  * AUCG-only member subset (F2) + the invalid-character set (A4).
  *
  * The O(n²) pairwise comparison becomes a hash aggregation on
  * `upper(targetSeq)` — identical grouping, first-encounter
  * representative and member order preserved via the block index.
  *
  * Fixed-not-copied reference bug: a trailing block that fails the marker
  * check crashes the original (`format_data` returning None is guarded
  * mid-file but not for the final buffer, `cluster_match.py:76-80`); we
  * drop such blocks uniformly.
  */
object ClusterMatch {

  private val markerRe = """\((\S+)\)""".r

  def parse(text: String, rnaTag: String): Vector[FnaBlock] = {
    val blocks = Vector.newBuilder[FnaBlock]
    val buff = scala.collection.mutable.ArrayBuffer.empty[String]
    var index = 0
    def flush(): Unit = {
      if (buff.nonEmpty) {
        index += 1
        parseBlock(index, buff.toVector, rnaTag).foreach(blocks += _)
        buff.clear()
      }
    }
    text.linesIterator.foreach { line =>
      if (line.startsWith(">>")) flush()
      buff += line
    }
    flush()
    blocks.result()
  }

  private def parseBlock(index: Int, lines: Vector[String], rnaTag: String): Option[FnaBlock] = {
    if (lines.length < 4) return None
    val markerItems = lines(3).trim.split("\\s+")
    if (markerItems.length < 2 || (markerItems(1) != "?" && markerItems(1) != "!")) return None
    val geneNo = markerItems(0).stripPrefix("(").stripSuffix(")")

    val tracks = Array.fill(3)(Option.empty[FnaTrack])
    var action = 0
    lines.drop(4).foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty) {
        val slot =
          if (line.startsWith(rnaTag)) { action = 1; 0 }
          else if (action == 1) { action = 2; 1 }
          else if (action == 2) { action = 0; 2 }
          else { action = 0; -1 }
        if (slot >= 0) tracks(slot) = Some(updateTrack(tracks(slot), line))
      }
    }
    Some(FnaBlock(index, geneNo, lines.take(4).map(_.stripLineEnd), tracks.flatten.toVector))
  }

  private def updateTrack(existing: Option[FnaTrack], line: String): FnaTrack = {
    if (!line.last.isDigit) {
      // continuation: bare sequence text appended
      val t = existing.getOrElse(FnaTrack("", 0, 0, ""))
      t.copy(seq = t.seq + line)
    } else {
      val info = line.split("\\s+")
      val (name, start, end) = (info(0), info(1).toInt, info.last.toInt)
      val seq = info.slice(2, info.length - 1).mkString(" ")
      existing match {
        case Some(t) => t.copy(end = end, seq = t.seq + seq)
        case None    => FnaTrack(name, start, end, seq)
      }
    }
  }

  /** J7 clustering: first-encounter-ordered clusters keyed by uppercased
    * target (middle) track.
    */
  def cluster(blocks: Seq[FnaBlock]): Seq[(FnaBlock, Seq[FnaBlock])] = {
    val order = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[FnaBlock]]
    blocks.foreach { b =>
      val key = b.tracks(1).seq.toUpperCase
      order.getOrElseUpdate(key, scala.collection.mutable.ArrayBuffer.empty) += b
    }
    order.values.map(ms => (ms.head, ms.toSeq)).toSeq
  }

  /** `size\tgeneNo,geneNo,...` lines (cluster_result). */
  def renderClusterResult(clusters: Seq[(FnaBlock, Seq[FnaBlock])]): String =
    clusters.map { case (_, ms) =>
      s"${ms.length}\t${ms.map(_.geneNo).mkString(",")}"
    }.mkString("", "\n", "\n")

  /** Representative blocks with the reference's fixed-width track render
    * (`%19s %8s %131s %8s`, cluster_match.py:109-113).
    */
  def renderSampleResult(clusters: Seq[(FnaBlock, Seq[FnaBlock])]): String = {
    val sb = new StringBuilder
    clusters.foreach { case (rep, _) =>
      rep.others.foreach(l => sb.append(l).append('\n'))
      sb.append('\n')
      rep.tracks.foreach { t =>
        sb.append(f"${t.name}%19s ${t.start.toString}%8s ${t.seq}%131s ${t.end.toString}%8s\n")
      }
      sb.append('\n')
    }
    sb.toString
  }

  /** (allResult, onlyResult, invalidChars): result-track fasta blocks for
    * every member; the AUCG-only subset (F2); the distinct non-AUCG
    * character set seen (A4). Reference `cluster_match.py:115-136`.
    */
  def renderMemberResults(clusters: Seq[(FnaBlock, Seq[FnaBlock])]): (String, String, Set[Char]) = {
    val all = new StringBuilder
    val only = new StringBuilder
    val invalid = scala.collection.mutable.LinkedHashSet.empty[Char]
    clusters.foreach { case (_, members) =>
      members.foreach { m =>
        val t = m.tracks.last
        var ok = true
        t.seq.trim.foreach { c =>
          if (!"AUCG".contains(c.toUpper)) { invalid += c.toUpper; ok = false }
        }
        val block = s">${t.name}/${t.start}-${t.end}\n${t.seq.toUpperCase}\n\n"
        all.append(block)
        if (ok) only.append(block)
      }
      all.append('\n')
      only.append('\n')
    }
    (all.toString, only.toString, invalid.toSet)
  }

  /** Distributed clustering over parsed blocks: hash aggregation replaces
    * the quadratic loop; members ordered by block index (= encounter
    * order), representative = min index.
    */
  def clusterDF(spark: SparkSession, blocks: Seq[FnaBlock]): DataFrame = {
    import spark.implicits._
    blocks.map(b => (b.index, b.geneNo, b.tracks(1).seq.toUpperCase))
      .toDF("index", "gene_no", "key")
      .groupBy("key")
      .agg(
        min("index").as("rep_index"),
        count(lit(1)).as("size"),
        array_join(transform(array_sort(collect_list(struct(col("index"), col("gene_no")))),
          s => s.getField("gene_no")), ",").as("members"))
      .orderBy("rep_index")
  }
}
