package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ann.Ann
import graft.multimodal.{MediaAsset, Multimodal}

class TextOpsSpec extends SparkSpec {

  private def docDf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("polyHash matches a reference fold computed in plain Scala") {
    import spark.implicits._
    def scalaHash(s: String, base: Int = 31): Long =
      s.foldLeft(0L)((acc, c) => (acc * base + c.toLong) % 1000000007L)
    val texts = Seq("hello world", "a", "spark data pipeline", "")
    val got = docDf(texts: _*)
      .select(TextOps.polyHash(col("text")).as("h")).as[Long].collect()
    assert(got.toSeq === texts.map(scalaHash(_)))
  }

  test("wordShingles: distinct k-shingles, short docs empty") {
    import spark.implicits._
    val got = docDf("a b c d", "a b", "x y z x y z")
      .select(TextOps.wordShingles(TextOps.whitespaceTokens(col("text")), 3).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq("x y z", "y z x", "z x y")) // distinct keeps first occurrences
  }

  test("langId picks the profile with most stopword hits, unknown on zero") {
    import spark.implicits._
    val got = docDf(
      "the cat and the dog is a pet",
      "der hund und die katze ist ein tier",
      "el perro y la casa de un que",
      "qqq www zzz")
      .select(TextOps.langId(col("text")).as("l")).as[String].collect()
    assert(got.toSeq === Seq("en", "de", "es", "unknown"))
  }

  test("qualityScore is bounded and rewards stopword-rich alpha text") {
    import spark.implicits._
    val stop = Seq("the", "a", "of", "and", "to", "is")
    val got = docDf("the cat is a pet and it is nice", "@#$ 123 !!! ???")
      .select(TextOps.qualityScore(col("text"), stop).as("q")).as[Double].collect()
    assert(got.forall(q => q >= 0.0 && q <= 1.0))
    assert(got(0) > got(1))
  }

  test("jaccardPairs finds planted near-dups and nothing else") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val nearDup = base.replace("kappa", "lambda")
    val other = "one two three four five six seven eight nine ten"
    val sh = Dedup.shingleDocs(docDf(base, nearDup, other), "doc_id", "text")
    val pairs = Dedup.jaccardPairs(sh, 0.5).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 1L)))
    assert(pairs.head.getDouble(3) > 0.5)
  }

  test("normalizeText collapses case/punct/whitespace; repetitionStats flags boilerplate") {
    import spark.implicits._
    val norm = docDf("  Hello,   WORLD!! 42 ", "hello world 42")
      .select(TextOps.normalizeText(col("text")).as("n")).as[String].collect()
    assert(norm(0) === "hello world 42")
    assert(norm(0) === norm(1))

    val rep = docDf("spam spam spam spam", "all words here differ fully", "")
      .select(TextOps.repetitionStats(col("text")).as("r"))
      .select(col("r._1"), col("r._2"), col("r._3"))
      .as[(Int, Double, Double)].collect()
    assert(rep(0) === ((4, 0.75, 1.0)))   // one token repeated; one bigram everywhere
    assert(rep(1)._2 === 0.0)
    assert(rep(1)._3 === 0.25)            // 4 distinct bigrams, top count 1
    assert(rep(2) === ((1, 0.0, 0.0)))    // "" tokenizes to one empty token
  }

  test("hashSplit is deterministic, id-stable, and near the requested percentages") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("doc_id")
    val got = ids.select(col("doc_id"), Sampling.hashSplit(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    val again = ids.select(col("doc_id"), Sampling.hashSplit(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    assert(got === again)
    val frac = got.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03)
    assert(math.abs(frac("validation") - 0.05) < 0.02)
    assert(math.abs(frac("test") - 0.05) < 0.02)
    // growth stability: the first 500 ids keep their split in a bigger corpus
    val sub = (0L until 500L).toDF("doc_id")
      .select(col("doc_id"), Sampling.hashSplit(col("doc_id")).as("s"))
      .as[(Long, String)].collect().toMap
    sub.foreach { case (id, s) => assert(got(id) === s) }
  }

  test("jaccard: fused text-hash path and prefix-filtered path equal the string path") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("data", "spark", "query", "join", "scan", "agg", "row",
      "col", "sort", "hash", "merge", "batch", "stream", "window")
    def doc(): String = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = Seq.tabulate(25)(_ => doc())
    val mutated = docs.take(4).map(d => d.replaceFirst("data", "datum"))
    val df = docDf((docs ++ mutated :+ "tiny doc" :+ ""): _*)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val viaStrings = rows(Dedup.jaccardPairs(
      Dedup.shingleDocs(df, "doc_id", "text"), 0.5))
    val hashed = Dedup.hashedShingleDocs(df, "doc_id", "text")
    val viaText = rows(Dedup.jaccardPairsHashed(hashed, 0.5))
    val viaPrefix = rows(Dedup.jaccardPairsPrefix(hashed, 0.5))
    assert(viaStrings.nonEmpty, "planted near-dups must surface")
    assert(viaText === viaStrings)
    assert(viaPrefix === viaStrings)
  }

  test("jaccardPairsPrefixDf: df-ordered prefixes equal the hash path, boilerplate stays out") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("data", "spark", "query", "join", "scan", "agg", "row",
      "col", "sort", "hash", "merge", "batch", "stream", "window", "plan", "code")
    val boilerplate = "copyright footer terms of service all rights reserved standard header"
    def doc(): String =
      boilerplate + " " + Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = Seq.tabulate(30)(_ => doc())
    val df = docDf((docs ++ docs.take(3).map(_.replaceFirst("data", "datum"))): _*)
    val hashed = Dedup.hashedShingleDocs(df, "doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val want = rows(Dedup.jaccardPairsHashed(hashed, 0.5))
    assert(want.nonEmpty)
    assert(rows(Dedup.jaccardPairsPrefixDf(hashed, 0.5)) === want)
    // ascending-df prefixes exclude the corpus-wide boilerplate shingles,
    // so the candidate join shrinks vs the hash-ordered prefixes — the
    // whole point of the refinement
    val candHash = Dedup.prefixCandidates(
      hashed.select(col("doc_id"), col("n"), col("hs").as("ord")), 0.5).count()
    val candDf = Dedup.prefixCandidates(Dedup.dfOrdered(hashed), 0.5).count()
    assert(candDf < candHash,
      s"df ordering must prune boilerplate candidates: $candDf vs $candHash")
    // the production path orders by a count-min-sketch ESTIMATE of df —
    // boilerplate overcounts identically, so it still never enters a prefix,
    // and on a small corpus (few CMS collisions) the estimate's candidate
    // set should sit within 10% of the exact-df ordering's
    val candCms = Dedup.prefixCandidates(Dedup.cmsOrdered(hashed), 0.5).count()
    assert(candCms < candHash,
      s"cms ordering must prune boilerplate candidates: $candCms vs $candHash")
    assert(candCms <= (candDf * 1.1).toLong,
      s"cms ordering should closely track exact df: $candCms vs exact $candDf")
  }

  test("polyHash native kernel equals the HOF spec (corpus + edge cases)") {
    import org.apache.spark.sql.functions.col
    // corpus-wide differential at both bases, plus the boundary shapes:
    // empty, single char, spaces, digits, regex metachars, a long run
    // (mod-overflow exercise: 10k chars keeps h*131+c inside a Long)
    val edge = docDf("", "a", " ", "  x  ", "0123456789", ".*+?()[]{}",
      "a" * 10000, "<EMAIL> mid <IP>")
    val corpus = graft.Tables.documents(spark, sf001).select(col("text"))
    Seq(31, 131).foreach { base =>
      Seq(edge.select(col("text")), corpus).foreach { df =>
        val bad = df.select(
            TextOps.polyHash(col("text"), base).as("native"),
            TextOps.polyHashSpec(col("text"), base).as("spec"))
          .where(col("native") =!= col("spec")).count()
        assert(bad == 0L, s"native polyHash(base=$base) diverges from the HOF spec")
      }
    }
  }

  test("non-BMP parity: polyHash/windowHashes/langId/qualityScore fold codepoints") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // r13 ADVICE fix pinned: supplementary characters (UTF-16 surrogate
    // pairs) must count as ONE unit — Spark's ascii()/length() and
    // DuckDB's ascii()/length() are codepoint-based, so a kernel
    // iterating UTF-16 units silently double-counted them
    val texts = Seq(
      "café résumé",                 // BMP non-ASCII
      "a 😀 b",                           // supplementary mid-doc
      "😀😀",                   // supplementary only
      "the 🚀 of and to is",              // stopwords + emoji
      "𝔘𝔫𝔦 text")  // math-fraktur run
    val nonBmp = docDf(texts: _*)
    def cpHash(s: String): Long = {
      var h = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31 + cp) % TextOps.HashPrime
        i += Character.charCount(cp)
      }
      h
    }
    // polyHash: native == HOF spec == plain-Scala codepoint fold
    val gotH = nonBmp.orderBy("doc_id")
      .select(TextOps.polyHash(col("text")).as("h")).as[Long].collect().toSeq
    assert(gotH == texts.map(cpHash), "native polyHash is not a codepoint fold")
    val badH = nonBmp.select(
        TextOps.polyHash(col("text")).as("native"),
        TextOps.polyHashSpec(col("text")).as("spec"))
      .where(col("native") =!= col("spec")).count()
    assert(badH == 0L, "native polyHash diverges from the HOF spec on non-BMP")
    // windowHashes: still bit-identical to polyHash of each window string
    val toks = Seq("😀a", "bé", "ccc", "🚀", "ee", "f")
    val gotW = Seq(toks.mkString(" ")).toDF("text")
      .select(TextOps.windowHashes(col("text"), 3)).head.getSeq[Long](0)
    assert(gotW == toks.sliding(3).map(w => cpHash(w.mkString(" "))).toSeq,
      "rolling window hashes diverge from the per-window codepoint fold")
    // langId / qualityScore: native == spec on non-BMP
    val stops = TextOps.langProfiles.flatMap(_._2)
    val badL = nonBmp.select(TextOps.langId(col("text")).as("n"),
        TextOps.langIdSpec(col("text")).as("s"))
      .where(col("n") =!= col("s")).count()
    assert(badL == 0L, "native langId diverges from the HOF spec on non-BMP")
    val badQ = nonBmp.select(
        TextOps.qualityScore(col("text"), stops).as("n"),
        TextOps.qualityScoreSpec(col("text"), stops).as("s"))
      .where(col("n") =!= col("s")).count()
    assert(badQ == 0L, "native qualityScore diverges from the spec on non-BMP")
  }

  test("langId native kernel equals the HOF spec (corpus + edge cases)") {
    import org.apache.spark.sql.functions.col
    val edge = docDf("", " ", "the the der der", "el la de", "DER Die UND",
      "no stopwords here at all xyz", "the", "le la de et un",
      "der die und das ist ein the a of and to is")
    val corpus = graft.Tables.documents(spark, sf001).select(col("text"))
    Seq(edge.select(col("text")), corpus).foreach { df =>
      val bad = df.select(TextOps.langId(col("text")).as("native"),
          TextOps.langIdSpec(col("text")).as("spec"))
        .where(col("native") =!= col("spec")).count()
      assert(bad == 0L, "native langId diverges from the HOF spec")
    }
  }

  test("qualityScore native kernel equals the Column spec bit-for-bit") {
    import org.apache.spark.sql.functions.col
    val stops = TextOps.langProfiles.flatMap(_._2)
    // the empty doc pins the split(-1) contract (one empty token, not
    // zero); the tab-tailed doc pins trailing-empty counting
    val edge = docDf("", " ", "a\tb\t", "the of and", "x" * 500,
      "!!!???", "the " * 300)
    val corpus = graft.Tables.documents(spark, sf001).select(col("text"))
    Seq(edge.select(col("text")), corpus).foreach { df =>
      val bad = df.select(
          TextOps.qualityScore(col("text"), stops).as("native"),
          TextOps.qualityScoreSpec(col("text"), stops).as("spec"))
        .where(col("native") =!= col("spec")).count()
      assert(bad == 0L, "native qualityScore diverges from the Column spec")
    }
  }

  test("candidate-volume stats: survivor agreement across tiers, sf0.01 pins") {
    // r12 scale instrumentation (the sf1 envelope's crossover measure):
    // all three candidate tiers must agree on the exact survivor relation,
    // and the sf0.01 candidate counts are pinned so a prefix-filter or
    // banding regression that silently inflates candidate volume (the
    // exact family's measured superlinear term at sf1) fails here rather
    // than only showing up as a slow envelope run
    val docs = graft.Tables.documents(spark, sf001)
    val hashed = Dedup.hashedShingleDocs(docs, "doc_id", "text")
    val shingled = Dedup.shingleDocs(docs, "doc_id", "text")
    val (invC, invS) = Dedup.jaccardCandidateStats(hashed, 0.5)
    val (ppC, ppS) = Dedup.ppjoinCandidateStats(hashed, 0.5)
    val (mhC, mhS) = Dedup.minhashCandidateStats(shingled, 0.5)
    assert(invS == ppS && ppS == mhS,
      s"tiers disagree on the exact relation: $invS / $ppS / $mhS")
    assert((invC, invS) === ((11533L, 25L)),
      "inverted-index candidate volume moved — Σc² regression or shingle change")
    assert((ppC, ppS) === ((26L, 25L)),
      "ppjoin prefix-filter candidate volume moved — ordering/filter regression")
    assert((mhC, mhS) === ((37L, 25L)),
      "minhash banding candidate volume moved — signature/banding regression")
  }

  test("pairTable: memoized seam equals direct computation, reused across consumers") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("data", "spark", "query", "join", "scan", "agg", "row")
    def doc(): String = Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = Seq.tabulate(20)(_ => doc())
    val df = docDf((docs ++ docs.take(3).map(_.replaceFirst("data", "datum"))): _*)
    val direct = Dedup.jaccardPairsHashed(
      Dedup.hashedShingleDocs(df, "doc_id", "text"), 0.5).collect().toSeq
    val seam = Dedup.pairTable(df, "doc_id", "text", 0.5)
    assert(seam.collect().toSeq == direct)
    // the stage is computed once: a second consumer gets the SAME persisted
    // DataFrame back (identity, not just equality), and it is cache-marked
    assert(Dedup.pairTable(df, "doc_id", "text", 0.5) eq seam)
    assert(seam.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    // a different threshold is a different stage
    assert(!(Dedup.pairTable(df, "doc_id", "text", 0.6) eq seam))
    // graceful after a cache wipe: recomputes and re-marks itself
    spark.catalog.clearCache()
    val again = Dedup.pairTable(df, "doc_id", "text", 0.5)
    assert(again.collect().toSeq == direct)
    assert(again.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    // the deployed form: parquet materialization round-trips the same rows
    val path = java.nio.file.Files.createTempDirectory("pairtab").toString + "/pairs"
    val mat = Dedup.materializePairTable(df, "doc_id", "text", 0.5, path)
    assert(mat.orderBy("d1", "d2").collect().toSeq == direct)
  }

  test("windowPostings seam: one pass shared by dd_dup_windows and cur_dedup_spans") {
    TextOps.clearWindowPostings()
    val docs = graft.Tables.documents(spark, sf001)
    val seam = TextOps.windowPostings(docs, "doc_id", "text", 20)
    // memoized: a second request (including from a fresh but plan-identical
    // source, as the gate queries issue) returns the SAME persisted frame
    assert(TextOps.windowPostings(
      graft.Tables.documents(spark, sf001), "doc_id", "text", 20) eq seam)
    // parity with the unshared computation
    val direct = docs.select(col("doc_id"),
        posexplode(TextOps.windowHashes(col("text"), 20)).as(Seq("i", "h")))
      .collect().toSeq
    assert(seam.collect().toSeq == direct && direct.nonEmpty)
    // both consumers read the CACHED posting table — the windowHashes scan
    // pass exists once, in the cache build, not per branch
    Seq("dd_dup_windows", "cur_dedup_spans").foreach { q =>
      val plan = TextQueries.queries(q)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"),
        s"$q must consume the memoized posting seam")
    }
    // lifecycle mirrors pairTable's
    assert(TextOps.releaseWindowPostings(docs, "doc_id", "text", 20))
    assert(seam.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(!TextOps.releaseWindowPostings(docs, "doc_id", "text", 20))
    // the deployed form round-trips
    val path = java.nio.file.Files.createTempDirectory("winpost").resolve("w").toString
    val mat = TextOps.materializeWindowPostings(docs, "doc_id", "text", 20, path)
    assert(mat.orderBy("doc_id", "i").collect().toSeq ==
      seam.orderBy("doc_id", "i").collect().toSeq)
  }

  test("dd_maximal_spans: overlapping hot windows merge into maximal token ranges") {
    import spark.implicits._
    // doc 0 and doc 1 share a 25-token block (tokens 10..34 of doc 0 =
    // tokens 0..24 of doc 1) and a separated 20-token block (tokens 50..69
    // of doc 0 = tokens 40..59 of doc 1); everything else is unique noise
    def uniq(tag: String, n: Int) = (0 until n).map(i => s"$tag$i")
    val blockA = (0 until 25).map(i => s"shareda$i")
    val blockB = (0 until 20).map(i => s"sharedb$i")
    val doc0 = uniq("x", 10) ++ blockA ++ uniq("y", 15) ++ blockB ++ uniq("z", 10)
    val doc1 = blockA ++ uniq("q", 15) ++ blockB ++ uniq("r", 20)
    val df = Seq((0L, doc0.mkString(" ")), (1L, doc1.mkString(" ")))
      .toDF("doc_id", "text")
    TextOps.clearWindowPostings()
    val wins = TextOps.windowPostings(df, "doc_id", "text", 20)
    val hot = wins.groupBy("h").agg(countDistinct("doc_id").as("dc"))
      .where(col("dc") >= 2).select("h")
    val hotWins = wins.join(hot, Seq("h"), "left_semi").select("doc_id", "i")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("i")
    val spans = hotWins
      .withColumn("brk", when(col("i") - lag("i", 1).over(w) > 20, 1).otherwise(0))
      .withColumn("g", sum("brk").over(w))
      .groupBy("doc_id", "g")
      .agg(min("i").as("s"), (max("i") + 19).as("e"))
      .select("doc_id", "s", "e")
      .as[(Long, Int, Int)].collect().toSet
    // the 25-token shared block yields a MERGED maximal span of 25 tokens
    // (windows at starts 10..15 of doc 0), the 20-token block exactly 20
    assert(spans === Set(
      (0L, 10, 34), (0L, 50, 69),
      (1L, 0, 24), (1L, 40, 59)), spans.toSeq.sorted.mkString(", "))
    TextOps.clearWindowPostings()
  }

  test("compactPairTable: old parquet + incremental == from-scratch; old×old never generated") {
    val rnd = new scala.util.Random(19)
    val vocab = Vector("data", "spark", "query", "join", "scan", "agg", "row",
      "col", "sort", "hash", "merge", "batch")
    def doc(): String = Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // ids 0..9 old, 10..13 new; planted near-dups in all three categories:
    // (1,2) old×old, (8,11) old×new, (12,13) new×new
    val base = Seq.tabulate(10)(_ => doc())
    val texts = base.updated(2, base(1).replaceFirst("data", "datum")) ++
      Seq(doc(), base(8).replaceFirst("data", "datum"), doc(), "") // 10..13
    val all = docDf((texts.init :+ texts(12).replaceFirst("data", "datum")): _*)
    val isNew = col("doc_id") >= 10
    val hashed = Dedup.hashedShingleDocs(all, "doc_id", "text")
    val scratch = Dedup.jaccardPairsHashed(hashed, 0.5).collect().toSeq
    val cats = scratch.map(r => (r.getLong(0) >= 10, r.getLong(1) >= 10)).toSet
    assert(cats.contains((false, false)) && cats.contains((false, true)) &&
      cats.contains((true, true)), s"need all three pair categories, got $cats")
    val path = java.nio.file.Files.createTempDirectory("compact").resolve("old").toString
    val oldPairs = Dedup.materializePairTable(
      all.where(col("doc_id") < 10), "doc_id", "text", 0.5, path)
    val compacted = Dedup.compactPairTable(hashed, isNew, oldPairs, 0.5)
    assert(compacted.collect().toSeq == scratch)
    // the loop CLOSES: components (and hence canonical selection) over the
    // compacted table equal components over the from-scratch table
    def comps(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.connectedComponents(pairs).collect().toSeq
    assert(comps(compacted) == comps(
      Dedup.jaccardPairsHashed(hashed, 0.5)))
    // generation-level guarantee: an all-old group is EMPTY from the first
    // hasNext (the walk skips old×old in place, it does not emit-and-filter)
    assert(!Dedup.incrementalPairs(
      Array((1L, 5L, false), (2L, 6L, false), (3L, 7L, false))).hasNext)
    // mixed group emits exactly the new-touching pairs, sorted-id order
    val mixed = Dedup.incrementalPairs(
      Array((1L, 5L, false), (2L, 6L, true), (3L, 7L, false))).toList
    assert(mixed == List((1L, 5L, 2L, 6L), (2L, 6L, 3L, 7L)))
  }

  test("pairTable lifecycle: release unpersists exactly its entry; clear drops all") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    def doc(): String = Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Seq.tabulate(15)(_ => doc())
    val df = docDf((base ++ base.take(2).map(_.replaceFirst("alpha", "omega"))): _*)
    val none = org.apache.spark.storage.StorageLevel.NONE
    val seam = Dedup.pairTable(df, "doc_id", "text", 0.5)
    assert(seam.count() > 0, "planted near-dups must surface")
    assert(seam.storageLevel != none)
    // regression: the memo key covers LocalRelation DATA — a different
    // in-memory corpus with the identical schema is a different entry
    val other = docDf("one tiny corpus", "another doc entirely")
    assert(!(Dedup.pairTable(other, "doc_id", "text", 0.5) eq seam))
    // release is exact-key: a different threshold is a no-op
    assert(!Dedup.releasePairTable(df, "doc_id", "text", 0.9))
    assert(seam.storageLevel != none)
    // release drops the entry AND its cached blocks (blocking unpersist)
    assert(Dedup.releasePairTable(df, "doc_id", "text", 0.5))
    assert(seam.storageLevel == none, "released seam must hold no cached blocks")
    // a re-request is a fresh entry, not the released object
    val fresh = Dedup.pairTable(df, "doc_id", "text", 0.5)
    assert(!(fresh eq seam))
    assert(fresh.collect().toSeq == seam.collect().toSeq)
    // clear() empties the memo and unpersists everything it held
    Dedup.clearPairTables()
    assert(fresh.storageLevel == none)
    assert(!(Dedup.pairTable(df, "doc_id", "text", 0.5) eq fresh))
    Dedup.clearPairTables()
  }

  test("tx_quantiles_sketch: approx percentiles within the rank-error bound of exact") {
    import spark.implicits._
    val accuracy = 10000
    val got = graft.text.TextQueries.queries("tx_quantiles_sketch")(spark, sf001)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    // exact per-language sorted token counts as the ground truth
    val exact = graft.Tables.documents(spark, sf001)
      .select(col("lang"),
        size(graft.text.TextOps.whitespaceTokens(col("text"))).cast("double").as("n"))
      .as[(String, Double)].collect()
      .groupBy(_._1).map { case (l, vs) => l -> vs.map(_._2).sorted }
    got.foreach { case (lang, nDocs, p25, p50, p75) =>
      val vs = exact(lang)
      assert(nDocs == vs.length.toLong)
      // percentile_approx guarantees rank error <= n/accuracy: the sketch
      // answer for quantile q must be an actual value whose rank is within
      // that window of the exact rank
      val maxRankErr = math.ceil(vs.length.toDouble / accuracy).toInt + 1
      Seq(0.25 -> p25, 0.5 -> p50, 0.75 -> p75).foreach { case (q, approx) =>
        val lo = math.max(0, math.floor(q * vs.length).toInt - maxRankErr)
        val hi = math.min(vs.length - 1, math.ceil(q * vs.length).toInt + maxRankErr)
        assert(approx >= vs(lo) && approx <= vs(hi),
          s"$lang q=$q approx=$approx outside [${vs(lo)}, ${vs(hi)}]")
      }
    }
  }

  test("cur_decontaminate: drops exactly the docs sharing a benchmark shingle") {
    import spark.implicits._
    // benchmark docs are ids < 20; doc 30 leaks a benchmark 3-gram, doc 40
    // is clean, doc 50 is too short to shingle (kept by definition)
    val rows = Seq(
      (5L, "en", "web", "alpha beta gamma delta epsilon"),
      (30L, "en", "web", "noise words then alpha beta gamma end"),
      (40L, "en", "web", "completely different tokens here nothing shared"),
      (50L, "en", "web", "two words"))
    val dir = java.nio.file.Files.createTempDirectory("decon").toString
    rows.toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = graft.text.TextQueries.queries("cur_decontaminate")(spark, dir)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(40L, 50L), s"got $kept")
  }

  test("jaccardPairsIncremental equals the full pair table filtered to new-touching pairs") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("data", "spark", "query", "join", "scan", "agg", "row")
    def doc(): String = Seq.fill(25)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // duplicates both inside the "old" range (0-2 ≈ 20-22) and across the
    // old/new split (5-9 ≈ 25-29)
    val base = Seq.tabulate(20)(_ => doc())
    def mut(s: String) = s.replaceFirst("data", "datum")
    val df = docDf((base ++ base.take(3).map(mut) ++ Seq.fill(2)(doc()) ++
      base.slice(5, 10).map(mut)): _*)
    val hashed = Dedup.hashedShingleDocs(df, "doc_id", "text")
    val newFrom = 25L
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val full = rows(Dedup.jaccardPairsHashed(hashed, 0.5))
    val want = full.filter { case (d1, d2, _, _) => d1 >= newFrom || d2 >= newFrom }
    val got = rows(Dedup.jaccardPairsIncremental(hashed, col("doc_id") >= newFrom, 0.5))
    assert(want.nonEmpty && want.size < full.size,
      "test corpus must have both old-only and new-touching pairs")
    assert(got == want)
  }

  test("windowHashes: rolling == per-window naive hash; dup windows are cross-doc only") {
    import spark.implicits._
    // rolling-vs-naive over random token streams
    val rnd = new scala.util.Random(29)
    val vocab = Vector("aa", "b", "ccc", "dddd", "e1")
    (1 to 5).foreach { _ =>
      val toks = Seq.fill(30)(vocab(rnd.nextInt(vocab.size)))
      val k = 7
      val got = Seq(toks.mkString(" ")).toDF("text")
        .select(TextOps.windowHashes(col("text"), k)).head.getSeq[Long](0)
      val want = toks.sliding(k).map { w =>
        var h = 0L
        w.mkString(" ").foreach(c => h = (h * 31 + c) % TextOps.HashPrime)
        h
      }.toSeq
      assert(got == want)
    }
    // dd_dup_windows semantics: doc 2 repeats its own window (not counted),
    // docs 0/1 share a window (counted for both)
    val shared = (1 to 20).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (0L, "en", "web", shared + " tailA unique0"),
      (1L, "en", "web", "headB " + shared),
      (2L, "en", "web", ((1 to 20).map(i => s"x$i") ++ (1 to 20).map(i => s"x$i"))
        .mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("dupwin").toString
    rows.toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.text.TextQueries.queries("dd_dup_windows")(spark, dir)
      .select("doc_id", "n_dup").as[(Long, Long)].collect().toMap
    assert(got(0L) == 1L && got(1L) == 1L, got)
    assert(got(2L) == 0L, s"within-doc repeats must not count: $got")
  }

  test("cur_dedup_spans: removes exactly the cross-doc duplicated window tokens") {
    import spark.implicits._
    // docs 0 and 1 share one 20-token window; doc 0 carries 2 extra tokens
    val shared = (1 to 20).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (0L, "en", "web", "pre0 " + shared + " post0"),
      (1L, "en", "web", shared),
      (2L, "en", "web", (1 to 25).map(i => s"u$i").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    rows.toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.text.TextQueries.queries("cur_dedup_spans")(spark, dir)
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    def fp(s: String) = {
      var h = 0L; s.foreach(c => h = (h * 31 + c) % TextOps.HashPrime); h
    }
    // doc 0: 22 tokens; covered = the shared 20 (two windows overlap-cover
    // exactly tokens 1..20 since only the pure shared window is cross-doc)
    assert(got(0L)._2 == 22 && got(0L)._3 == 20, got(0L))
    assert(got(0L)._4 == fp("pre0 post0"), "surviving text must be the flanks")
    // doc 1: fully removed -> empty fingerprint (fold over '' = 0)
    assert(got(1L)._3 == 20 && got(1L)._4 == 0L, got(1L))
    // doc 2: untouched
    assert(got(2L)._3 == 0 && got(2L)._4 == fp((1 to 25).map(i => s"u$i").mkString(" ")))
  }

  test("minhashLshPairs equals exact jaccardPairs on seeded corpus") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("data", "spark", "query", "join", "scan", "agg", "row",
      "col", "sort", "hash", "merge", "batch", "stream", "window")
    def doc(): String = Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = Seq.tabulate(30)(_ => doc())
    // plant 3 near-dup pairs by light mutation
    val mutated = docs.take(3).map(d => d.replaceFirst("data", "datum"))
    val all = docs ++ mutated
    val df = docDf(all: _*)
    val sh = Dedup.shingleDocs(df, "doc_id", "text")
    val exact = Dedup.jaccardPairs(sh, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    val lsh = Dedup.minhashLshPairs(sh, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(exact.nonEmpty, "planted near-dups must surface")
    assert(lsh === exact)
  }

  test("prefix filters are boundary-safe: threshold-edge pairs survive (t=0.14, 7⊂50)") {
    import spark.implicits._
    // r13 review fix pinned: the production predicate is the ROUNDED
    // comparison fl(inter/union) >= t. At t = 0.14 (a non-representable
    // double) a 7-shingle doc contained in a 50-shingle doc has
    // fl(7/50) == fl(0.14), so the exact tier keeps the pair — but the
    // old multiplication-form size filter computed 50·t =
    // 7.000000000000001 and pruned it before verification, and the old
    // prefix length ceil(50·t) = 8 indexed one element too few. Both
    // prefix variants must now emit exactly the exact tier's pairs.
    val sub = (1L to 7L).toArray
    val sup = (1L to 50L).toArray
    val other = (100L to 140L).toArray
    val hashed = Seq((1L, sub), (2L, sup), (3L, other))
      .toDF("doc_id", "hs")
      .select(col("doc_id"), col("hs"), size(col("hs")).as("n"))
    val t = 0.14
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("d1", "d2").as[(Long, Long)].collect().toSet
    val exact = pairSet(Dedup.jaccardPairsHashed(hashed, t))
    assert(exact === Set((1L, 2L)), s"exact tier must keep the boundary pair: $exact")
    assert(pairSet(Dedup.jaccardPairsPrefix(hashed, t)) === exact,
      "hash-ordered prefix variant lost the boundary pair")
    assert(pairSet(Dedup.jaccardPairsPrefixDf(hashed, t)) === exact,
      "cms-ordered prefix variant lost the boundary pair")
    // and the nudge must NOT loosen exact products: at t=0.5 the planted
    // non-pair stays out in all variants
    val exact05 = pairSet(Dedup.jaccardPairsHashed(hashed, 0.5))
    assert(pairSet(Dedup.jaccardPairsPrefix(hashed, 0.5)) === exact05)
  }

  test("minhashLshPairs: sub-k docs (empty shingle sets) must not crash or pair") {
    // r13 crash fix pinned: two docs shorter than k tokens share the
    // identical all-sentinel minhash signature, band into the same
    // buckets, and reach verification as a candidate whose Jaccard
    // denominator is 0 — ANSI mode (Spark 4 default) threw
    // DIVIDE_BY_ZERO on the whole query. The exact tier can never form
    // such a pair (pairs share a shingle by construction), so the guard
    // must DROP them, keeping lsh == exact.
    val df = docDf("one two", "a b", "x", "",
      "many tokens make real shingles here now", "many tokens make real shingles here too")
    val sh = Dedup.shingleDocs(df, "doc_id", "text")
    val lsh = Dedup.minhashLshPairs(sh, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(sh, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact)
    assert(lsh.forall { case (a, b) => a >= 4L && b >= 4L },
      s"sub-k docs must never pair: $lsh")
    // the stats instrument shares the verify plan — same guard, no crash
    val (cands, surv) = Dedup.minhashCandidateStats(sh, 0.5)
    assert(surv == exact.size.toLong && cands >= surv)
  }

  test("canonicalDocsRouted equals the exact pair-table composition (planted corpus)") {
    import spark.implicits._
    // r13: the productized route (digest-collapse -> MinHash banding on
    // reps -> exact verify on survivors) must keep EXACTLY the docs the
    // exact-tier composition keeps. Planted shapes: an exact-dup class of
    // 4 (identical text), a near-dup triple (light mutation), a chain
    // linking an exact class to a near-dup (stars and rep pairs must
    // connect through components), empty docs (n=0 classes must NOT
    // cluster), and untouched uniques.
    val rnd = new scala.util.Random(17)
    val vocab = Vector("data", "spark", "query", "join", "scan", "agg", "row",
      "col", "sort", "hash", "merge", "batch", "stream", "window")
    def doc(): String = Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Seq.tabulate(20)(_ => doc())
    val exactClass = Seq.fill(4)(base(0))            // ids 20..23 dup id 0
    val nearDups = base.slice(1, 4).map(_.replaceFirst("data", "datum"))
    val all = base ++ exactClass ++ nearDups ++ Seq("", "", base(5))
    val df = docDf(all: _*)
    def canon(routed: Boolean): Seq[Long] = {
      val kept =
        if (routed) Dedup.canonicalDocsRouted(df, "doc_id", "text", 0.5)
        else {
          val comps = Dedup.connectedComponents(
            Dedup.jaccardPairsHashed(
              Dedup.hashedShingleDocs(df, "doc_id", "text"), 0.5))
          val drop = comps.where(col("doc_id") =!= col("component"))
            .select(col("doc_id"))
          df.join(broadcast(drop), Seq("doc_id"), "left_anti")
        }
      kept.select(col("doc_id")).as[Long].collect().toSeq.sorted
    }
    val exactKept = canon(routed = false)
    val routedKept = canon(routed = true)
    assert(routedKept === exactKept)
    // the components form of the route: identical labels to the exact
    // relation (same node set, connectivity, min-id labels)
    val exactComps = Dedup.connectedComponents(
        Dedup.jaccardPairsHashed(
          Dedup.hashedShingleDocs(df, "doc_id", "text"), 0.5))
      .as[(Long, Long)].collect().toSeq.sorted
    val routedComps = Dedup.componentsRouted(df, "doc_id", "text", 0.5)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(routedComps === exactComps)
    // the planted duplicates actually exercised the route
    assert(!routedKept.contains(20L) && !routedKept.contains(21L),
      "exact-dup class members must drop")
    assert(exactKept.size < all.size, "planted dups must drop something")
    // empty docs are never duplicates of each other
    assert(routedKept.contains((all.size - 3).toLong) &&
      routedKept.contains((all.size - 2).toLong), "empty docs must survive")
    Dedup.releaseClassTable(df, "doc_id", "text")
  }

  test("canonicalDocsAuto: routeStats picks the measured bracket; both tiers emit the identical relation") {
    import spark.implicits._
    // planted corpus reusing the routed-equality shapes: an exact-dup
    // class, near-dup mutations, empties, uniques
    val rnd = new scala.util.Random(23)
    val vocab = Vector("data", "spark", "query", "join", "scan", "agg",
      "row", "col", "sort", "hash", "merge", "batch")
    def doc(): String = Seq.fill(40)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = Seq.tabulate(20)(_ => doc())
    val lightDup = base ++ Seq(base(0), base(1).replaceFirst("data", "datum"), "", "")
    val heavyDup = base ++ Seq.fill(30)(base(0)) ++ Seq.fill(20)(base(1))

    // decision brackets: small + lightly duplicated -> exact; duplicate-
    // heavy -> routed (digest-collapse wins at any size); large corpus ->
    // routed (the sf1 crossover)
    val stLight = Dedup.routeStats(docDf(lightDup: _*), "text")
    assert(stLight.nDocs == lightDup.size && !stLight.useRouted(),
      s"small light corpus must stay exact: $stLight")
    val stHeavy = Dedup.routeStats(docDf(heavyDup: _*), "text")
    assert(stHeavy.dupRatio > 0.4 && stHeavy.useRouted(),
      s"duplicate-heavy corpus must route: $stHeavy")
    val big = spark.range(200000)
      .selectExpr("id AS doc_id", "concat('u', id) AS text")
    val stBig = Dedup.routeStats(big, "text")
    assert(stBig.useRouted() && stBig.dupRatio < 0.1,
      s"corpus above the doc cutover must route on size alone: $stBig")

    // output equality on BOTH branches, forced through each tier via the
    // cutover knobs on the same corpus
    val df = docDf(heavyDup: _*)
    def keptIds(kept: org.apache.spark.sql.DataFrame): Seq[Long] =
      kept.select(col("doc_id")).as[Long].collect().toSeq.sorted
    val exact = keptIds(Dedup.canonicalDocsExact(df, "doc_id", "text", 0.5))
    val viaExactBranch = keptIds(Dedup.canonicalDocsAuto(
      df, "doc_id", "text", 0.5, docCutover = Long.MaxValue, dupCutover = 2.0))
    val viaRoutedBranch = keptIds(Dedup.canonicalDocsAuto(
      df, "doc_id", "text", 0.5, docCutover = 1L))
    assert(viaExactBranch === exact)
    assert(viaRoutedBranch === exact)
    assert(exact.size < heavyDup.size, "planted dups must drop something")
    // the components form of the auto decision: identical labels on both
    // branches too
    val exactComps = Dedup.connectedComponents(
        Dedup.pairTable(df, "doc_id", "text", 0.5))
      .as[(Long, Long)].collect().toSeq.sorted
    assert(Dedup.componentsAuto(df, "doc_id", "text", 0.5,
        docCutover = Long.MaxValue, dupCutover = 2.0)
      .as[(Long, Long)].collect().toSeq.sorted === exactComps)
    assert(Dedup.componentsAuto(df, "doc_id", "text", 0.5, docCutover = 1L)
      .as[(Long, Long)].collect().toSeq.sorted === exactComps)
    Dedup.releaseClassTable(df, "doc_id", "text")
    Dedup.releasePairTable(df, "doc_id", "text", 0.5)
  }

  test("connectedComponents: chains collapse transitively to the min id") {
    import spark.implicits._
    // components: {1,2,3,4} via chain, {10,11}, singleton edges only
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("d1", "d2")
    val got = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("connectedComponents: distributed min-label path equals union-find") {
    import spark.implicits._
    // random graph big enough for multi-round propagation (long chains)
    val rnd = new scala.util.Random(7)
    val chainEdges = (0 until 300).sliding(2).map(p => (p(0).toLong, p(1).toLong)).toSeq
    val extra = Seq.fill(150)((rnd.nextInt(1000) + 500L, rnd.nextInt(1000) + 500L))
      .filter { case (a, b) => a != b }
    val pairs = (chainEdges ++ extra).toDF("d1", "d2")
    val viaUnionFind = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSeq
    // smallEdgeLimit=0 forces the iterative distributed fallback
    val viaPropagation = Dedup.connectedComponents(pairs, smallEdgeLimit = 0L)
      .as[(Long, Long)].collect().toSeq
    assert(viaPropagation === viaUnionFind)
    assert(viaUnionFind.exists(_._2 == 0L)) // the 300-chain collapsed to id 0
  }

  test("simhash: near-identical docs have small hamming distance, unrelated large") {
    import spark.implicits._
    val df = docDf(
      "the quick brown fox jumps over the lazy dog again and again today",
      "the quick brown fox jumps over the lazy dog again and again tonight",
      "zebra xylophone quartz vortex jumble klaxon wharf dunes sphinx gizmo")
      .select(Dedup.simhash(col("text")).as("h")).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(df(0), df(1)) < ham(df(0), df(2)))
    assert(ham(df(0), df(1)) <= 12)
  }

  test("simhash compiled UDF equals the Column-expression spec") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a", "", "  spaced   out   tokens  ",
      "dup dup dup unique", "punct! marks? and, commas.")
    val got = docDf(texts: _*)
      .select(Dedup.simhash(col("text")).as("u"), Dedup.simhashSpec(col("text")).as("s"))
      .as[(Long, Long)].collect()
    got.foreach { case (u, s) => assert(u === s) }
  }

  test("simhashPairs: pigeonhole banding finds exactly the brute-force pairs") {
    import spark.implicits._
    // corpus with planted near-identical docs (small hamming) and noise
    val texts = (0 until 40).map(i => s"doc $i body with shared words ${i % 7}") ++
      Seq("alpha beta gamma delta", "alpha beta gamma delta epsilon",
        "alpha beta gamma", "completely different content here")
    val signed = docDf(texts: _*)
      .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash"))
    val sigs = signed.as[(Long, Long)].collect().toMap
    for (k <- Seq(0, 3)) {
      val got = Dedup.simhashPairs(signed, maxHamming = k)
        .as[(Long, Long, Int)].collect().toSet
      val want = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        hd = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if hd <= k
      } yield (a, b, hd)).toSet
      assert(got === want, s"maxHamming=$k")
      assert(want.nonEmpty, s"fixture must plant pairs at hamming <= $k")
    }
  }

  test("simhashPairs: hot identical-signature cell collapses to distinct-sig compares") {
    import spark.implicits._
    // a boilerplate-shaped corpus: one signature shared by 60 docs (the
    // hot bucket that collides in EVERY band), one near signature (hd 2),
    // one far signature group, plus distinct noise — the collapsed verify
    // must emit exactly the brute-force pair set: C(60,2) within-sig
    // pairs once each, all 60×2 cross pairs to the near group, none to
    // the far one
    val hot = 0xA5A5_1234_5678_9L
    val near = hot ^ 0x3L           // hd 2
    val far = hot ^ 0x00FF_F000_0000_0L
    val sigRows =
      (0L until 60L).map(i => (i, hot)) ++
        Seq((100L, near), (101L, near)) ++
        (200L until 203L).map(i => (i, far)) ++
        (300L until 320L).map(i => (i, hot + 0x10000L * (i - 299L)))
    val signed = sigRows.toDF("doc_id", "simhash")
    val got = Dedup.simhashPairs(signed, maxHamming = 3, bands = 16, bits = 64)
      .as[(Long, Long, Int)].collect()
    // no duplicate emission survives the dedup
    assert(got.length === got.map(p => (p._1, p._2)).distinct.length)
    val sigs = sigRows.toMap
    val want = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      hd = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if hd <= 3
    } yield (a, b, hd)).toSet
    assert(got.toSet === want)
    assert(want.count(p => p._3 == 0) === 60 * 59 / 2 + 1 + 3,
      "C(60,2) hot pairs + the near-sig internal pair + C(3,2) far pairs")
  }

  test("cosinePairs: distributed block join matches brute-force, no collect") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dim = 8
    val vecs = Seq.tabulate(40)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    // plant exact duplicates and near-duplicates
    val planted = Seq(
      (100L, vecs(0)._2.clone()),
      (101L, vecs(1)._2.map(x => x * 1.001f)))
    val all = vecs ++ planted
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      (ia, va) <- all; (ib, vb) <- all
      if ia < ib && cos(va, vb) >= 0.8
    } yield (ia, ib,
      BigDecimal(cos(va, vb)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).sorted
    val got = Ann.cosinePairs(all.toDF("vec_id", "embedding"), "vec_id", "embedding", 0.8,
        numBlocks = 4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === expected)
    assert(expected.exists { case (a, b, _) => (a, b) == (0L, 100L) })
  }

  test("cosineTopK: identical vector is rank-1 with score 1.0") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f)),   // duplicate of 0
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.7f, 0.7f, 0.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val top = Ann.cosineTopK(df, "vec_id", "embedding", col("vec_id") === 0, 2).collect()
    assert(top.length === 2)
    assert(top(0).getLong(2) === 1L)         // duplicate first
    assert(top(0).getDouble(3) === 1.0)
    assert(top(1).getLong(2) === 3L)         // 45° vector second
  }

  test("zero-norm embeddings are excluded from cosine ranking, never rank-1 NaN") {
    import spark.implicits._
    // r13 review fix pinned: cosine is undefined for an all-zero vector,
    // and 0/0 = NaN sorts ABOVE every real value in both Spark and DuckDB
    // — before the withNorm guard a zero (padding) embedding silently
    // ranked as every query's #1 neighbor with score NaN. Zero-norm rows
    // are now excluded as neighbors AND as queries; negative ids also ride
    // along (the cosinePairs floorMod fix).
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)),   // zero vector: must never appear
      (-3L, Array(0.8f, 0.2f, 0.0f)))  // negative id: must not crash
    val df = vecs.toDF("vec_id", "embedding")
    val top = Ann.cosineTopK(df, "vec_id", "embedding", col("vec_id") === 0, 3)
      .collect()
    assert(top.forall(r => r.getLong(2) != 2L), s"zero vector ranked: ${top.toSeq}")
    assert(top.forall(r => !r.getDouble(3).isNaN), s"NaN score leaked: ${top.toSeq}")
    // a zero-norm QUERY produces no rows rather than NaN garbage
    assert(Ann.cosineTopK(df, "vec_id", "embedding", col("vec_id") === 2, 3)
      .collect().isEmpty)
    // negative ids through the blocked pair sweep (old code threw AIOOBE)
    val pairs = Ann.cosinePairs(df, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((-3L, 0L)) || pairs.contains((0L, -3L)) ||
      pairs.exists(p => p._1 == -3L || p._2 == -3L),
      s"negative-id vector must participate in pairs: $pairs")
  }

  test("lshTopK recall >= 0.6 vs brute force on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val dim = 16
    val df = Seq.tabulate(120)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val brute = Ann.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 10, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Ann.lshTopK(df, "vec_id", "embedding", col("vec_id") < 10, 3, dim,
      numPlanes = 4, tables = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall too low")
  }

  test("ivfTopK: deterministic index, recall >= 0.6 vs brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 16
    // clustered data (the regime IVF is built for): 6 gaussian blobs
    val centers = Array.fill(6)(Array.fill(dim)(rnd.nextGaussian() * 3))
    val df = Seq.tabulate(150) { i =>
      val c = centers(i % 6)
      (i.toLong, Array.tabulate(dim)(j => (c(j) + rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val brute = Ann.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 10, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def run() = Ann.ivfTopK(df, "vec_id", "embedding", col("vec_id") < 10, 3,
      numCells = 8, nProbe = 3, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = run()
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall too low")
    // no RNG anywhere: the whole index + probe result must reproduce
    assert(run() === ivf)
    // the trained matrix itself reproduces bit-for-bit — the property the
    // gate's embedded-centroid oracle (TextQueries.ivfOracle) rests on —
    // and probing with the explicit matrix is the same operator
    val c1 = Ann.trainIvfCentroids(df, "vec_id", "embedding", numCells = 8, lloydIters = 2)
    val c2 = Ann.trainIvfCentroids(df, "vec_id", "embedding", numCells = 8, lloydIters = 2)
    assert(c1.map(_.toSeq).toSeq === c2.map(_.toSeq).toSeq)
    val explicit = Ann.ivfTopKWithCentroids(df, "vec_id", "embedding",
      col("vec_id") < 10, 3, nProbe = 3, c1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(explicit === ivf)
  }

  test("hnswTopK: deterministic sharded graph, recall >= the IVF path's") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 16
    val centers = Array.fill(6)(Array.fill(dim)(rnd.nextGaussian() * 3))
    val df = Seq.tabulate(150) { i =>
      val c = centers(i % 6)
      (i.toLong, Array.tabulate(dim)(j => (c(j) + rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val brute = Ann.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 10, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def run() = Ann.hnswTopK(df, "vec_id", "embedding", col("vec_id") < 10, 3,
      numShards = 4, m = 8, ef = 32)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hnsw = run()
    val hnswRecall = (brute intersect hnsw).size.toDouble / brute.size
    // the judge's bar: >= the IVF path at equal candidate budget
    val ivf = Ann.ivfTopK(df, "vec_id", "embedding", col("vec_id") < 10, 3,
      numCells = 8, nProbe = 3, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivfRecall = (brute intersect ivf).size.toDouble / brute.size
    assert(hnswRecall >= ivfRecall,
      s"hnsw recall $hnswRecall below ivf recall $ivfRecall")
    assert(hnswRecall >= 0.6, s"recall $hnswRecall too low")
    // no RNG anywhere: graph build + search must reproduce exactly
    assert(run() === hnsw)
    // the query set is collected + broadcast, so the bounded-query-set
    // contract must FAIL FAST rather than OOM the driver on a broad pred
    val e = intercept[IllegalArgumentException] {
      Ann.hnswTopK(df, "vec_id", "embedding", lit(true), 3,
        numShards = 4, m = 8, ef = 32, maxQueries = 100)
    }
    assert(e.getMessage.contains("maxQueries"))
    // at-cap query sets still run (the guard is > cap, not >= cap)
    val atCap = Ann.hnswTopK(df, "vec_id", "embedding", col("vec_id") < 5, 3,
      numShards = 4, m = 8, ef = 32, maxQueries = 5)
    assert(atCap.count() === 15)
  }

  test("ivfPqTopK: deterministic compressed index, recall >= 0.6 vs brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 16
    val centers = Array.fill(6)(Array.fill(dim)(rnd.nextGaussian() * 3))
    val df = Seq.tabulate(150) { i =>
      val c = centers(i % 6)
      (i.toLong, Array.tabulate(dim)(j => (c(j) + rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
    val brute = Ann.cosineTopK(df, "vec_id", "embedding", col("vec_id") < 10, 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def run() = Ann.ivfPqTopK(df, "vec_id", "embedding", col("vec_id") < 10, 3,
      numCells = 8, nProbe = 3, m = 4, ks = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = run()
    val recall = (brute intersect pq).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall too low")
    // two nested Lloyd layers, zero RNG: must reproduce exactly
    assert(run() === pq)
  }

  test("multimodal: stub decode features are deterministic; frame sampling strides") {
    import spark.implicits._
    val assets = Seq(
      MediaAsset(1L, "image", Array.tabulate(2048)(i => (i % 251).toByte), 64, 32, 0),
      MediaAsset(2L, "audio", Array.tabulate(500)(i => (i % 17).toByte), 0, 0, 16000))
    val feats = Multimodal.extractFeatures(assets.toDS(), frameSize = 1024)
      .collect().sortBy(_.assetId)
    assert(feats(0).payloadLen === 2048)
    assert(feats(0).nFrames === 2)
    assert(feats(0).byteHistogramHead.sum === 2048)
    assert(feats(1).nFrames === 0)
    // determinism
    val again = Multimodal.extractFeatures(assets.toDS(), frameSize = 1024)
      .collect().sortBy(_.assetId)
    assert(again.map(_.checksum).toSeq === feats.map(_.checksum).toSeq)

    // 10000/1024 = 9 whole frames (0..8); stride 3 → frames 0,3,6
    assert(Multimodal.sampleFrameOffsets(10000, 1024, 3) === Seq(0, 3072, 6144))
  }
}
