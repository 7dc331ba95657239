package graft.io

import org.apache.spark.sql.{Dataset, SparkSession}

/** One ATCC-style FASTA record with bracket attributes (reference
  * `ATCCGeneSegment`, `src/utils/atcc_database.py:11-50`).
  */
final case class FastaRecord(
    locusTag: Option[String],
    location: Option[String],
    gbkey: Option[String],
    gene: String,
    start: Option[Int],
    end: Option[Int],
    sequence: String)

/** S2 — ATCC FASTA scan: `>lcl|...`-delimited records whose headers carry
  * `[attr=value]` pairs; locations are `complement(a..b)` or `a..b`;
  * sequences lowercase-joined; missing gene names become
  * `Unknown:<locus_tag>` (reference `atcc_database.py:20-66`).
  */
object Fasta {

  private val attrNames = Seq("locus_tag", "location", "gbkey", "gene")
  private val complementRe = raw"complement\((\d+)\.\.(\d+)\)".r
  private val plainRe = raw"(\d+)\.\.(\d+)".r

  def parse(text: String): Vector[FastaRecord] = {
    val records = Vector.newBuilder[FastaRecord]
    val buff = scala.collection.mutable.ArrayBuffer.empty[String]
    var started = false
    def flush(): Unit = if (buff.nonEmpty) { records += parseRecord(buff.toVector); buff.clear() }
    text.linesIterator.foreach { line =>
      if (line.startsWith(">lcl")) { flush(); started = true }
      if (started) buff += line.trim
    }
    flush()
    records.result()
  }

  private def parseRecord(buff: Vector[String]): FastaRecord = {
    val attrs = scala.collection.mutable.Map.empty[String, String]
    buff.head.split("\\s+").foreach { item =>
      attrNames.foreach { attr =>
        val m = raw"(?i)^\[$attr=(.+)\]$$".r.findFirstMatchIn(item)
        m.foreach(mm => attrs(attr) = mm.group(1))
      }
    }
    val location = attrs.get("location")
    val (start, end) = location match {
      case Some(loc) =>
        complementRe.findFirstMatchIn(loc)
          .orElse(plainRe.findFirstMatchIn(loc))
          .map(m => (Some(m.group(1).toInt), Some(m.group(2).toInt)))
          .getOrElse((None, None))
      case None => (None, None)
    }
    val gene = attrs.getOrElse("gene", s"Unknown:${attrs.getOrElse("locus_tag", "")}")
    FastaRecord(attrs.get("locus_tag"), location, attrs.get("gbkey"), gene,
      start, end, buff.tail.mkString.toLowerCase)
  }

  def read(spark: SparkSession, path: String): Dataset[FastaRecord] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .as[String].flatMap(parse)
  }

  /** SPLITTABLE reader for large FASTA files: the Hadoop line reader splits
    * on the `\n>` record boundary instead of `\n`, so one multi-GB file
    * fans out by block rather than landing on one task ([[read]]'s
    * `wholetext` shape). Records spanning a split boundary are completed by
    * TextInputFormat's next-delimiter scan; parsing stays on the executors.
    */
  def readSplittable(spark: SparkSession, path: String): Dataset[FastaRecord] = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\n>")
    spark.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text],
        conf)
      .map(_._2.toString)
      .toDS()
      // the first chunk keeps its leading '>'; later chunks lost it to the
      // delimiter — restore so parse sees the same record text
      .flatMap { raw =>
        val text = if (raw.startsWith(">")) raw else ">" + raw
        parse(text)
      }
  }
}
