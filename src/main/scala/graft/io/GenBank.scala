package graft.io

import org.apache.spark.sql.{Dataset, SparkSession}

/** One annotated feature interval from a GenBank flat file (reference
  * `NCBIGeneSegment`, `src/utils/ncbi_database.py:24-56`). `left`/`right`
  * are the 1-based inclusive feature bounds; `complement` records the
  * strand (the reference drops it — we keep it, it is free and lossless).
  */
final case class GeneSegment(
    gene: Option[String],
    left: Int,
    right: Int,
    complement: Boolean,
    product: Option[String],
    proteinId: Option[String],
    locusTag: Option[String],
    geneId: Option[Long],
    geneSynonym: Option[String],
    codonStart: Option[String],
    translTable: Option[String],
    translation: Option[String],
    xref: Map[String, String])

final case class GenBankFile(
    source: Option[String],
    segments: Vector[GeneSegment],
    dna: String)

/** S1 — GenBank flat-file parser (reference `NCBIDatabase`,
  * `src/utils/ncbi_database.py:73-176`): a 3-phase line state machine
  * (Header → feature blocks → ORIGIN dna), kept as a pure
  * `String => GenBankFile` function so it unit-tests without Spark and
  * wraps into a reader with `wholetext` (GenBank files are one record per
  * file; a custom FileFormat buys nothing).
  *
  * Parity notes (SURVEY §7.4 #5):
  *   - only `gene` and `repeat_region` features are captured (CDS etc.
  *     are attribute noise to the reference too);
  *   - fuzzy bounds `<`/`>` are stripped;
  *   - `join(...)` / `complement(join(...))` features are skipped;
  *   - attribute continuation lines re-extract on the accumulated line;
  *   - `/db_xref="GeneID:n"` → numeric geneId, other xrefs → map.
  */
object GenBank {

  def parse(text: String, includeRepeatRegions: Boolean = true): GenBankFile = {
    var source: Option[String] = None
    val segments = Vector.newBuilder[GeneSegment]
    val dna = new java.lang.StringBuilder
    val featureBuff = scala.collection.mutable.ArrayBuffer.empty[String]

    def isFeatureStart(stripped: String): Boolean =
      stripped.startsWith("gene    ") ||
        (includeRepeatRegions && stripped.startsWith("repeat_region "))

    def flushFeature(): Unit = {
      if (featureBuff.nonEmpty) {
        parseFeature(featureBuff.toVector).foreach(segments += _)
        featureBuff.clear()
      }
    }

    var phase = 0 // 0=header 1=features 2=dna
    val lines = text.linesIterator
    var done = false
    while (lines.hasNext && !done) {
      val line = lines.next()
      val stripped = line.trim
      phase match {
        case 0 =>
          if (stripped.startsWith("SOURCE"))
            // reference-exact: splitting the raw line (with newline) leaves a
            // trailing empty token → trailing space in the joined value
            // (`ncbi_database.py:82`)
            source = Some(stripped.split("\\s+").drop(1).mkString(" ") + " ")
          else if (isFeatureStart(stripped)) {
            phase = 1
            featureBuff += line
          }
        case 1 =>
          if (isFeatureStart(stripped)) {
            flushFeature()
            featureBuff += line
          } else if (line.nonEmpty && line.charAt(0) != ' ') {
            // ORIGIN (or any column-0 line) ends the feature table
            flushFeature()
            phase = 2
          } else featureBuff += line
        case 2 =>
          if (stripped.startsWith("//")) done = true
          else {
            // "      241 agcttttcat tctga..." → drop the position, join groups
            val items = stripped.split("\\s+")
            var i = 1
            while (i < items.length) { dna.append(items(i)); i += 1 }
          }
      }
    }
    GenBankFile(source, segments.result(), dna.toString)
  }

  /** Parse one feature block; None when the location is unsupported
    * (`join(...)`, reversed bounds) — the reference skips those with a
    * warning (`ncbi_database.py:142-151`).
    */
  private def parseFeature(lines: Vector[String]): Option[GeneSegment] = {
    val header = lines.head.trim
    val parts = header.split("\\s+")
    if (parts.length != 2) return None
    val loc = parts(1)
    if (loc.startsWith("join") || loc.startsWith("complement(join")) return None
    val complement = loc.startsWith("complement(")
    val inner = loc.stripPrefix("complement(").stripSuffix(")")
    val bounds = inner.split("\\.\\.").map(_.replaceAll("[<>]", ""))
    if (bounds.length != 2) return None
    val (l, r) =
      try (bounds(0).toInt, bounds(1).toInt)
      catch { case _: NumberFormatException => return None }
    if (l >= r) return None // reference asserts inter[0] < inter[1]

    val attrs = scala.collection.mutable.Map.empty[String, String]
    val xref = scala.collection.mutable.Map.empty[String, String]
    var geneId: Option[Long] = None
    var lastLine = ""
    lines.drop(1).foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty) {
        if (line.charAt(0) == '/') lastLine = line
        else lastLine = lastLine + " " + line
        for (attr <- Seq("product", "gene", "protein_id", "codon_start", "transl_table",
                         "gene_synonym", "locus_tag", "translation")) {
          if (lastLine.startsWith(s"/$attr="))
            attrs(attr) = lastLine.substring(attr.length + 2).stripPrefix("\"").stripSuffix("\"")
        }
        if (lastLine.startsWith("/db_xref=")) {
          val v = lastLine.stripPrefix("/db_xref=").replaceAll("^\"|\"$", "")
          v.split(":", 2) match {
            case Array(k, value) =>
              if (k.equalsIgnoreCase("geneid")) {
                val digits = value.takeWhile(_ != '"').filter(_.isDigit)
                if (digits.nonEmpty) geneId = Some(digits.toLong)
              } else xref(k) = value
            case _ => ()
          }
        }
      }
    }
    Some(GeneSegment(
      gene = attrs.get("gene"),
      left = l, right = r, complement = complement,
      product = attrs.get("product"),
      proteinId = attrs.get("protein_id"),
      locusTag = attrs.get("locus_tag"),
      geneId = geneId,
      geneSynonym = attrs.get("gene_synonym"),
      codonStart = attrs.get("codon_start"),
      translTable = attrs.get("transl_table"),
      translation = attrs.get("translation"),
      xref = xref.toMap))
  }

  /** Spark reader: one GenBank file per row (`wholetext`), parsed on the
    * executors. Returns (file path, parsed record).
    */
  def read(spark: SparkSession, path: String): Dataset[(String, GenBankFile)] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(org.apache.spark.sql.functions.input_file_name().as("file"), org.apache.spark.sql.functions.col("value"))
      .as[(String, String)]
      .map { case (f, text) => (f, parse(text)) }
  }

  /** Segments as a standalone Dataset (the usual join input). */
  def readSegments(spark: SparkSession, path: String): Dataset[GeneSegment] = {
    import spark.implicits._
    read(spark, path).flatMap(_._2.segments)
  }

  /** SPLITTABLE reader for concatenated multi-record GenBank flat files
    * (e.g. NCBI division `.seq` files: records terminated by a `//` line).
    * [[read]]'s `wholetext` puts a whole file on ONE task — fine for the
    * reference's one-accession-per-file layout, fatal for a 100 GB
    * concatenated dump. Here the Hadoop line reader splits on the record
    * terminator instead of `\n`, so a file fans out by HDFS block and a
    * record spanning a split boundary is handled by TextInputFormat's
    * usual next-delimiter scan. Parsing stays on the executors.
    */
  def readConcatenated(spark: SparkSession, path: String): Dataset[GenBankFile] = {
    import spark.implicits._
    val conf = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("textinputformat.record.delimiter", "\n//")
    spark.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[org.apache.hadoop.mapreduce.lib.input.TextInputFormat],
        classOf[org.apache.hadoop.io.LongWritable],
        classOf[org.apache.hadoop.io.Text],
        conf)
      .map(_._2.toString)
      .toDS()
      // the chunk after a terminator starts at the newline the delimiter
      // left behind; the tail chunk after the last `//` is blank; the FIRST
      // chunk of an NCBI division file carries the file header before its
      // LOCUS line
      .flatMap { raw =>
        val text = raw.dropWhile(c => c == '\n' || c == '\r')
        if (text.startsWith("LOCUS")) Some(text)
        else {
          val i = text.indexOf("\nLOCUS")
          if (i >= 0) Some(text.substring(i + 1)) else None
        }
      }
      .map(text => parse(text))
  }
}
