package graft.io

import graft.SparkSpec
import graft.bio.InterRecord

/** IO parsers vs expectations produced by EXECUTING the reference parsers
  * on the same authored fixtures (quirks asserted, not sanitized):
  *   - SOURCE keeps a trailing space;
  *   - CDS blocks bleed attributes into the preceding gene segment — that
  *     is HOW products get filled at all (gene features carry none);
  *   - non-'/' continuation lines append to the last attribute line, so
  *     thrB's locus_tag swallows the CDS header text;
  *   - join(...) features are skipped; fuzzy bounds are stripped.
  */
class IoSpec extends SparkSpec {

  private def resource(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  test("GenBank parse matches executed reference on the fixture") {
    val gb = GenBank.parse(
      scala.io.Source.fromResource("test_genome.gb").mkString)
    assert(gb.source === Some("Escherichia coli str. K-12 "))
    assert(gb.dna.length === 220)
    assert(gb.dna.take(30) === "agcttttcattctgactgcaacgggcaata")
    assert(gb.dna.takeRight(20) === "tagcaccaccattaccacca")

    assert(gb.segments.length === 4)
    val Seq(thrA, thrB, rep, fuzzy) = gb.segments

    assert(thrA.gene === Some("thrA"))
    assert((thrA.left, thrA.right) === ((10, 45)))
    assert(!thrA.complement)
    assert(thrA.product === Some("aspartate kinase")) // bled from CDS
    assert(thrA.proteinId === Some("NP_414542.1"))
    assert(thrA.locusTag === Some("b0001"))
    assert(thrA.geneId === Some(945803L))
    assert(thrA.xref === Map("EcoGene" -> "EG10998"))

    assert(thrB.gene === Some("thrB"))
    assert((thrB.left, thrB.right) === ((60, 120)))
    assert(thrB.complement)
    assert(thrB.product === Some("homoserine kinase with a continued description line"))
    // continuation-line quirk: the CDS header text lands in locus_tag
    assert(thrB.locusTag === Some("b0002\" CDS             complement(60..120)"))

    assert(rep.gene === None) // repeat_region has no /gene
    assert((rep.left, rep.right) === ((180, 195)))

    assert(fuzzy.gene === Some("fuzzy"))
    assert((fuzzy.left, fuzzy.right) === ((200, 215))) // <..> stripped
    // join(130..150,160..170) feature skipped entirely
    assert(!gb.segments.exists(_.gene.contains("joined")))
  }

  test("GenBank Spark reader round-trips the same parse") {
    val segs = GenBank.readSegments(spark, resource("test_genome.gb")).collect()
    assert(segs.length === 4)
    assert(segs.flatMap(_.gene).toSet === Set("thrA", "thrB", "fuzzy"))
  }

  test("GenBank splittable concatenated reader == per-file parse, across forced splits") {
    // build a division-style file: header lines, then 6 records back-to-back
    val one = scala.io.Source.fromResource("test_genome.gb").mkString
    val two = scala.io.Source.fromResource("syn_genome.gb").mkString
    def terminated(s: String) = if (s.endsWith("\n")) s else s + "\n"
    val concat = "GBBCT1.SEQ          Genetic Sequence Data Bank\n  6 loci\n\n" +
      Seq(one, two, one, two, one, two).map(terminated).mkString
    val dir = java.nio.file.Files.createTempDirectory("gbcat")
    val f = dir.resolve("division.seq")
    java.nio.file.Files.write(f, concat.getBytes("UTF-8"))

    val want = Seq(one, two).map(GenBank.parse(_))
    // force many tiny input splits so records straddle split boundaries
    spark.sparkContext.hadoopConfiguration
      .setLong("mapreduce.input.fileinputformat.split.maxsize", 512)
    try {
      val got = GenBank.readConcatenated(spark, f.toString).collect()
      assert(got.length === 6)
      // every record parses identically to its standalone form
      got.zipWithIndex.foreach { case (g, i) =>
        val w = want(i % 2)
        assert(g.dna === w.dna, s"record $i dna")
        assert(g.segments === w.segments, s"record $i segments")
        assert(g.source === w.source, s"record $i source")
      }
    } finally {
      spark.sparkContext.hadoopConfiguration
        .unset("mapreduce.input.fileinputformat.split.maxsize")
    }
  }

  test("ATCC FASTA parse: attrs, locations, Unknown fallback, lowercase join") {
    val recs = Fasta.parse(scala.io.Source.fromResource("test_atcc.fna").mkString)
    assert(recs.length === 3)
    assert(recs(0).gene === "alr")
    assert((recs(0).start, recs(0).end) === ((Some(100), Some(200))))
    assert(recs(0).sequence === "acgtacgtacgtacgt")
    assert(recs(1).gene === "Unknown:AT2")
    assert((recs(1).start, recs(1).end) === ((Some(300), Some(350))))
    assert(recs(2).locusTag === Some("AT3"))
  }

  test("FASTA splittable reader == wholetext reader, across forced splits") {
    val text = scala.io.Source.fromResource("test_atcc.fna").mkString
    val dir = java.nio.file.Files.createTempDirectory("fnacat")
    val f = dir.resolve("big.fna")
    // repeat the fixture so the file is long enough to split mid-record
    val repeated = (text + "\n") * 20
    java.nio.file.Files.write(f, repeated.getBytes("UTF-8"))
    spark.sparkContext.hadoopConfiguration
      .setLong("mapreduce.input.fileinputformat.split.maxsize", 256)
    try {
      val got = Fasta.readSplittable(spark, f.toString).collect()
      val want = Fasta.read(spark, f.toString).collect()
      assert(got.length === want.length)
      assert(got.sortBy(r => (r.gene, r.sequence)).toSeq ===
        want.sortBy(r => (r.gene, r.sequence)).toSeq)
      assert(got.length === 60)
    } finally {
      spark.sparkContext.hadoopConfiguration
        .unset("mapreduce.input.fileinputformat.split.maxsize")
    }
  }

  test("EcoCyc TSV loader: sentinel coercion + inter-record generation") {
    val ds = EcocycTsv.read(spark, resource("test_ecocyc.tsv"))
    val rows = ds.collect().sortBy(_.gene)
    assert(rows.length === 4)
    val revG = rows.find(_.gene == "revG").get
    assert(revG.promoterPos === -1) // short row → sentinel
    assert(revG.mapStartPos === -1)

    val thrL = rows.find(_.gene == "thrL").get
    val withPromoter = EcocycTsv.interRecords(thrL, outputPromoter = true)
    assert(withPromoter.map(_.name) === Seq("thrL", "thrLp"))
    assert(withPromoter(1).start === 148)
    assert(withPromoter(1).end === 190)
    assert(!withPromoter(1).isGene)
    assert(EcocycTsv.interRecords(thrL, outputPromoter = false).map(_.name) === Seq("thrL"))

    val insB1 = rows.find(_.gene == "insB1").get
    val ir = EcocycTsv.interRecords(insB1, outputPromoter = false).head
    assert(ir.direction === '<') // map positions reversed
    assert((ir.left, ir.right) === ((5120, 5563)))
  }

  test("InterRecord direction and normalization") {
    val f = InterRecord("x", "", 10, 20, isGene = true)
    assert(f.direction === '>')
    val r = InterRecord("y", "", 20, 10, isGene = true)
    assert(r.direction === '<')
    assert((r.left, r.right) === ((10, 20)))
  }

  test("BlockText: render → blocks → parse round-trip") {
    val rendered =
      BlockText.renderMatchBlock(1, "NC_000913.3", 100, 119,
        Seq("name" -> "geneA", "direction" -> "+", "weighted_similarity" -> "12.00"),
        Seq("consistency_gene_format   :" -> "acgtacgt",
            "consistency_target_format :" -> "acgtacgt",
            "consistency_match_format  :" -> "********")) +
      BlockText.renderMatchBlock(2, "NC_000913.3", 250, 231,
        Seq("name" -> "geneB", "direction" -> "-", "weighted_similarity" -> "8.00"),
        Seq("consistency_match_format  :" -> "****...."))

    val bs = BlockText.blocks(rendered)
    assert(bs.length === 2)
    val b1 = BlockText.parseSimilarityBlock(bs(0))
    assert((b1.start, b1.end) === ((100, 119)))
    assert(b1.direction === ">>>>>>>>>>")
    assert(b1.matchInfo.linesIterator.toSeq.head === "name\tgeneA")
    assert(b1.matchInfo.contains("consistency_match_format  :********"))
    assert(!b1.matchInfo.contains("direction")) // stripped like the reference
    val b2 = BlockText.parseSimilarityBlock(bs(1))
    assert((b2.start, b2.end) === ((250, 231)))
    assert(b2.direction === "<<<<<<<<<<")
  }
}
