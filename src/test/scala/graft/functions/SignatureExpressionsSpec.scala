package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r11 native-kernel differentials: each new codegen expression pinned
  * bit-identical to an independent re-implementation of the Scala UDF it
  * replaced (the UDF bodies re-derived here from first principles, NOT by
  * calling the production path — so a drift in either side fails).
  */
class SignatureExpressionsSpec extends SparkSpec {

  private val P = 1000000007L

  // ---- independent reference implementations (the old UDF arithmetic) ----

  private def refParams(h: Int): Seq[(Long, Long)] =
    (0 until h).map { i =>
      (((2L * i + 1) * 2654435761L) % P, (i * 40503L * 2654435789L + 17) % P)
    }

  private def refMinhash(sh: Seq[String], numHashes: Int): Seq[Long] = {
    val params = refParams(numHashes)
    val sig = Array.fill(numHashes)(P)
    sh.foreach { s =>
      var h = 0L
      s.foreach(c => h = (h * 31 + c) % P)
      params.zipWithIndex.foreach { case ((a, b), p) =>
        val v = (h * a + b) % P
        if (v < sig(p)) sig(p) = v
      }
    }
    sig.toSeq
  }

  private def refHyperplane(v: Seq[Float], dim: Int, numPlanes: Int, off: Int): Long = {
    var sig = 0L
    for (p <- 0 until numPlanes) {
      var dot = 0.0
      for (j <- 0 until dim) dot += v(j).toDouble * graft.ann.Ann.planeComponent(off + p, j)
      if (dot > 0) sig |= (1L << p)
    }
    sig
  }

  private def refShingles(text: String, k: Int): Seq[String] = {
    val toks = text.trim.split("\\s+")
    if (toks.length < k) Seq.empty
    else (0 to toks.length - k).map(i => toks.slice(i, i + k).mkString(" ")).distinct
  }

  private def refHashedShingles(text: String, k: Int): Seq[Long] =
    refShingles(text, k).map { s =>
      var h1 = 0L; var h2 = 0L
      s.foreach { c => h1 = (h1 * 31 + c) % P; h2 = (h2 * 131 + c) % P }
      h1 * P + h2
    }.distinct.sorted

  private val sampleTexts: Seq[String] = {
    val rnd = new scala.util.Random(1311)
    val words = Vector("the", "cat", "sat", "on", "a", "mat", "naïve", "café",
      "gene", "walk", "Ωmega", "x1", "zz", "行走", "ACGT")
    Seq.tabulate(200) { i =>
      if (i == 0) "" else if (i == 1) "one two" else if (i == 2) "  padded   spaces  "
      else Seq.fill(1 + rnd.nextInt(40))(words(rnd.nextInt(words.length))).mkString(" ")
    }
  }

  test("minhash_signature_native equals the UDF fold bit-for-bit (ASCII + non-ASCII + empty)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val shingleSets: Seq[(Int, Seq[String])] =
      sampleTexts.zipWithIndex.map { case (t, i) => (i, refShingles(t, 3)) } :+
        (900, Seq.empty[String]) :+ (901, Seq("日本語 テキスト 混在", "héllo wörld 試験"))
    val df = shingleSets.toDF("id", "shingles")
    df.createOrReplaceTempView("mh_test")
    val got = spark.sql(
      "SELECT id, minhash_signature_native(shingles, 32) AS sig FROM mh_test ORDER BY id")
      .as[(Int, Seq[Long])].collect().toSeq
    val want = shingleSets.sortBy(_._1).map { case (i, sh) => (i, refMinhash(sh, 32)) }
    assert(got === want)
  }

  test("minhash: Column API matches SQL form; plan stays UDF-free; null propagates") {
    import spark.implicits._
    val df = sampleTexts.zipWithIndex.map { case (t, i) => (i, refShingles(t, 3)) }
      .toDF("id", "shingles")
    val viaColumn = df.select(col("id"),
      graft.text.Dedup.minhashSignature(col("shingles"), 32).as("sig"))
    assert(!viaColumn.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("mh_col_test")
    val viaSql = spark.sql(
      "SELECT id, minhash_signature_native(shingles, 32) AS sig FROM mh_col_test")
    assert(viaColumn.orderBy("id").as[(Int, Seq[Long])].collect().toSeq ===
      viaSql.orderBy("id").as[(Int, Seq[Long])].collect().toSeq)
    val n = spark.sql(
      "SELECT minhash_signature_native(CAST(NULL AS ARRAY<STRING>), 4)").collect().head
    assert(n.isNullAt(0))
  }

  test("hyperplane_signature_native equals the UDF loop; short vectors fail loud") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(47)
    val dim = 16
    val rows = Seq.tabulate(150)(i => (i, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("id", "v")
    df.createOrReplaceTempView("hp_test")
    for (off <- Seq(0, 8, 24)) {
      val got = spark.sql(
        s"SELECT id, hyperplane_signature_native(v, $dim, 8, $off) AS sig FROM hp_test ORDER BY id")
        .as[(Int, Long)].collect().toSeq
      val want = rows.map { case (i, v) => (i, refHyperplane(v, dim, 8, off)) }
      assert(got === want, s"offset $off")
    }
    // extra trailing components are ignored (the UDF's j < dim loop)
    val wide = Seq((0, Seq.fill(dim + 5)(0.25f))).toDF("id", "v")
    wide.createOrReplaceTempView("hp_wide")
    assert(spark.sql(s"SELECT hyperplane_signature_native(v, $dim, 8, 0) FROM hp_wide")
      .collect().head.getLong(0) ===
      refHyperplane(Seq.fill(dim + 5)(0.25f), dim, 8, 0))
    val e = intercept[Exception] {
      spark.sql(s"SELECT hyperplane_signature_native(array(CAST(1.0 AS FLOAT)), $dim, 8, 0)")
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("shingle_strings_native equals the UDF tokenizer (order + distinct) on 200 texts") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = sampleTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    df.createOrReplaceTempView("ss_test")
    for (k <- Seq(1, 2, 3, 5)) {
      val got = spark.sql(
        s"SELECT id, shingle_strings_native(text, $k) AS sh FROM ss_test ORDER BY id")
        .as[(Int, Seq[String])].collect().toSeq
      val want = sampleTexts.zipWithIndex.map { case (t, i) => (i, refShingles(t, k)) }
      assert(got === want, s"k=$k")
    }
  }

  test("hashed_shingles_native equals the string-shingle rehash (sorted distinct) on 200 texts") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = sampleTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    df.createOrReplaceTempView("hs_test")
    for (k <- Seq(2, 3)) {
      val got = spark.sql(
        s"SELECT id, hashed_shingles_native(text, $k) AS hs FROM hs_test ORDER BY id")
        .as[(Int, Seq[Long])].collect().toSeq
      val want = sampleTexts.zipWithIndex.map { case (t, i) => (i, refHashedShingles(t, k)) }
      assert(got === want, s"k=$k")
    }
    // and the production frame builder rides the same expression, UDF-free
    val hashed = graft.text.Dedup.hashedShingleDocs(df, "id", "text")
    assert(!hashed.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }

  test("simhash_native equals the UDF vote fold bit-for-bit on 200 texts") {
    import spark.implicits._
    GraftExtensions.register(spark)
    def refSimhash(s: String): Long = {
      val toks = s.trim.split("\\s+").distinct
      val votes = new Array[Int](60)
      toks.foreach { t =>
        var h1 = 0L; var h2 = 0L
        t.foreach { c => h1 = (h1 * 31 + c) % P; h2 = (h2 * 131 + c) % P }
        for (b <- 0 until 30) {
          votes(b) += (if (((h1 >> b) & 1L) == 1L) 1 else -1)
          votes(b + 30) += (if (((h2 >> b) & 1L) == 1L) 1 else -1)
        }
      }
      (0 until 60).foldLeft(0L)((sig, b) => if (votes(b) > 0) sig | (1L << b) else sig)
    }
    val df = sampleTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    df.createOrReplaceTempView("sh_test")
    val got = spark.sql("SELECT id, simhash_native(text) AS s FROM sh_test ORDER BY id")
      .as[(Int, Long)].collect().toSeq
    val want = sampleTexts.zipWithIndex.map { case (t, i) => (i, refSimhash(t)) }
    assert(got === want)
    val viaColumn = df.select(col("id"), graft.text.Dedup.simhash(col("text")).as("s"))
    assert(!viaColumn.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    assert(viaColumn.orderBy("id").as[(Int, Long)].collect().toSeq === want)
  }

  test("token_ngrams_native: order-preserving n-grams WITH duplicates on 200 texts") {
    import spark.implicits._
    GraftExtensions.register(spark)
    def refNgrams(text: String, n: Int): Seq[String] = {
      val toks = text.trim.split("\\s+")
      if (toks.length < n) Seq.empty
      else (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" "))
    }
    val df = sampleTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    df.createOrReplaceTempView("ng_test")
    for (n <- Seq(1, 2, 3)) {
      val got = spark.sql(
        s"SELECT id, token_ngrams_native(text, $n) AS ng FROM ng_test ORDER BY id")
        .as[(Int, Seq[String])].collect().toSeq
      val want = sampleTexts.zipWithIndex.map { case (t, i) => (i, refNgrams(t, n)) }
      assert(got === want, s"n=$n")
    }
  }

  test("window_hashes_native: rolling hash equals per-window polyHash rehash on 200 texts") {
    import spark.implicits._
    GraftExtensions.register(spark)
    // independent reference: hash each window STRING separately (the
    // oracle's non-rolling form the rolling computation must equal)
    def refWindows(text: String, k: Int): Seq[Long] = {
      val toks = text.trim.split("\\s+")
      if (toks.length < k) Seq.empty
      else (0 to toks.length - k).map { i =>
        var h = 0L
        toks.slice(i, i + k).mkString(" ").foreach(c => h = (h * 31 + c) % P)
        h
      }
    }
    val df = sampleTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    df.createOrReplaceTempView("wh_test")
    for (k <- Seq(2, 5)) {
      val got = spark.sql(
        s"SELECT id, window_hashes_native(text, $k) AS wh FROM wh_test ORDER BY id")
        .as[(Int, Seq[Long])].collect().toSeq
      val want = sampleTexts.zipWithIndex.map { case (t, i) => (i, refWindows(t, k)) }
      assert(got === want, s"k=$k")
    }
    // the production seam rides the same expression, UDF-free
    val viaColumn = df.select(graft.text.TextOps.windowHashes(col("text"), 5).as("wh"))
    assert(!viaColumn.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }

  test("hash_shingle_array_native equals the per-shingle rehash (sorted distinct)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val shingleSets = sampleTexts.zipWithIndex.map { case (t, i) => (i, refShingles(t, 3)) }
    val df = shingleSets.toDF("id", "shingles")
    df.createOrReplaceTempView("hsa_test")
    val got = spark.sql(
      "SELECT id, hash_shingle_array_native(shingles) AS hs FROM hsa_test ORDER BY id")
      .as[(Int, Seq[Long])].collect().toSeq
    val want = shingleSets.map { case (i, sh) =>
      (i, sh.map { s =>
        var h1 = 0L; var h2 = 0L
        s.foreach { c => h1 = (h1 * 31 + c) % P; h2 = (h2 * 131 + c) % P }
        h1 * P + h2
      }.distinct.sorted)
    }
    assert(got === want)
  }

  test("CmsOrderedSort equals the sketch sortBy the UDF computed; deterministic across runs") {
    import spark.implicits._
    val docs = sampleTexts.zipWithIndex.map(_.swap).toDF("doc_id", "text")
    val hashed = graft.text.Dedup.hashedShingleDocs(docs, "doc_id", "text")
    val cms = hashed.select(explode(col("hs")).as("s"))
      .stat.countMinSketch("s", 5, 1 << 16, 42)
    val bc = spark.sparkContext.broadcast(cms)
    import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
    val sorted = hashed.select(col("doc_id"),
      colOf(CmsOrderedSort(expression(col("hs")), bc)).as("ord"))
    assert(!sorted.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    val got = sorted.orderBy("doc_id").as[(Int, Seq[Long])].collect().toSeq
    val want = hashed.orderBy("doc_id").as[(Int, Seq[Long], Int)].collect().toSeq
      .map { case (id, hs, _) =>
        (id, hs.sortBy(h => (cms.estimateCount(h), h)))
      }
    assert(got === want)
    val again = sorted.orderBy("doc_id").as[(Int, Seq[Long])].collect().toSeq
    assert(got === again)
  }

  test("repetition_stats_native equals the UDF tuple on 200 texts") {
    import spark.implicits._
    GraftExtensions.register(spark)
    def refStats(text: String): (Int, Double, Double) = {
      val toks = text.trim.split("\\s+")
      val n = toks.length
      val dup = if (n == 0) 0.0 else (n - toks.distinct.length).toDouble / n
      val top =
        if (n < 2) 0.0
        else toks.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max.toDouble / (n - 1)
      (n, dup, top)
    }
    val df = sampleTexts.zipWithIndex.map(_.swap).toDF("id", "text")
    df.createOrReplaceTempView("rs_test")
    val got = spark.sql(
      """SELECT id, repetition_stats_native(text) AS r FROM rs_test ORDER BY id""")
      .select(col("id"), col("r._1"), col("r._2"), col("r._3"))
      .as[(Int, Int, Double, Double)].collect().toSeq
    val want = sampleTexts.zipWithIndex.map { case (t, i) =>
      val (n, d, b) = refStats(t); (i, n, d, b)
    }
    assert(got === want)
    val viaColumn = df.select(graft.text.TextOps.repetitionStats(col("text")).as("r"))
    assert(!viaColumn.queryExecution.executedPlan.toString.contains("ScalaUDF"))
  }

  test("span_surgery_native: covered tokens removed, null hot list removes nothing") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rows = Seq(
      (1, "a b c d e f g h", Some(Seq(1, 4))),    // windows of 2 at 1 and 4
      (2, "a b c d", Some(Seq(0, 1, 2))),          // overlapping full cover
      (3, "x y z", None),                          // left-outer miss side
      (4, "solo", Some(Seq.empty[Int])))
    val df = rows.toDF("id", "text", "hot")
    df.createOrReplaceTempView("surg_test")
    def refSurgery(text: String, hot: Option[Seq[Int]], k: Int): (Int, Int, Long) = {
      val toks = text.trim.split("\\s+")
      val covered = Array.fill(toks.length)(false)
      hot.getOrElse(Seq.empty).foreach { i0 =>
        (i0 until math.min(i0 + k, toks.length)).foreach(covered(_) = true)
      }
      val kept = toks.indices.collect { case i if !covered(i) => toks(i) }
      var h = 0L
      kept.mkString(" ").foreach(c => h = (h * 31 + c) % P)
      (toks.length, toks.length - kept.length, h)
    }
    val got = spark.sql(
      "SELECT id, span_surgery_native(text, hot, 2) AS r FROM surg_test ORDER BY id")
      .select(col("id"), col("r._1"), col("r._2"), col("r._3"))
      .as[(Int, Int, Int, Long)].collect().toSeq
    val want = rows.map { case (i, t, h) =>
      val (n, rm, fp) = refSurgery(t, h, 2); (i, n, rm, fp)
    }
    assert(got === want)
    // doc 3 (null hot list) must keep everything
    assert(got.find(_._1 == 3).get._3 === 0)
  }

  test("sortPairs fuzz: dual-array quicksort equals sortBy on 500 random arrays") {
    val rnd = new scala.util.Random(8191)
    for (trial <- 0 until 500) {
      val n = rnd.nextInt(200)
      // small key space to force est ties → hash tiebreak coverage
      val est = Array.fill(n)(rnd.nextInt(5).toLong)
      val hs = Array.fill(n)(rnd.nextInt(50).toLong)
      val want = (est zip hs).sortBy(p => (p._1, p._2)).toSeq
      CmsOrderedSort.sortPairs(est, hs, 0, n - 1)
      assert((est zip hs).toSeq === want, s"trial $trial n=$n")
    }
  }
}
