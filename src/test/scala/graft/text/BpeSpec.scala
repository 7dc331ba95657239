package graft.text

import graft.SparkSpec
import graft.functions.BpeEncodeTokens
import org.apache.spark.sql.functions._

/** BPE tokenizer: trainer arithmetic on a hand-derivable corpus, trainer
  * determinism under repartitioning, and the fast-kernel vs textbook
  * reference differential (per word AND per document over the real
  * corpus) that the `tx_bpe_encode` oracle dim depends on.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(merges: Seq[Bpe.Merge])
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] =
    BpeEncodeTokens.buildTable(merges.toArray.map(p => Array(p._1, p._2))).ranks

  private def fastWord(w: String, merges: Seq[Bpe.Merge]): Seq[String] =
    BpeEncodeTokens.encodeWord(w, ranksOf(merges)).toSeq.map(_.toString)

  test("trainer learns the hand-derivable merge sequence") {
    // freq: ab×10, abc×5, bc×3.
    //   round 1: (a,b) 15 vs (b,c) 8 → merge (a,b)
    //   round 2: (ab,c) 5 vs (b,c) 3 → merge (ab,c)
    //   round 3: (b,c) 3              → merge (b,c)
    //   round 4: nothing twice        → stop early
    val merges = Bpe.trainFromCounts(
      Seq(("ab", 10L), ("abc", 5L), ("bc", 3L)), numMerges = 10)
    assert(merges == Seq(("a", "b"), ("ab", "c"), ("b", "c")))
  }

  test("tie-break is (count desc, left asc, right asc) — deterministic") {
    // "ba"×2 and "ab"×2: pairs (b,a)=2 and (a,b)=2 tie → (a,b) wins
    val merges = Bpe.trainFromCounts(Seq(("ba", 2L), ("ab", 2L)), 1)
    assert(merges == Seq(("a", "b")))
  }

  test("overlap rule: fuse-all is left-to-right non-overlapping") {
    assert(Bpe.fuseAll(Array("a", "a", "a"), ("a", "a")).toSeq == Seq("aa", "a"))
    assert(Bpe.fuseAll(Array("a", "a", "a", "a"), ("a", "a")).toSeq ==
      Seq("aa", "aa"))
  }

  test("training is bit-identical at any partitioning (1 vs 32 partitions)") {
    val docs = graft.Tables.documents(spark, sf0001)
    val t1 = Bpe.train(docs.repartition(1), "text", numMerges = 24)
    val t32 = Bpe.train(docs.repartition(32), "text", numMerges = 24)
    assert(t1.merges == t32.merges)
    assert(t1.wordFreq == t32.wordFreq)
    assert(t1.complete && t32.complete)
  }

  test("fast kernel == textbook reference on every corpus word and on fuzz") {
    val trained = Bpe.train(graft.Tables.documents(spark, sf0001), "text", 24)
    val words = trained.wordFreq.map(_._1)
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(fastWord(w, trained.merges) == Bpe.referenceEncodeWord(w, trained.merges),
        s"fast != reference on corpus word '$w'")
    }
    // fuzz: repeats (the overlap rule), 1-char, chars outside the trained
    // alphabet, non-ASCII, and random letter strings — both paths must
    // agree everywhere, not just on the trained vocabulary
    val rnd = new scala.util.Random(11)
    val fuzz = Seq("", "a", "aaaa", "abababab", "zzzzzz", "naïve", "日本語",
      "xyzzy") ++ (1 to 200).map(_ =>
      (1 to (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    fuzz.foreach { w =>
      assert(fastWord(w, trained.merges) == Bpe.referenceEncodeWord(w, trained.merges),
        s"fast != reference on fuzz word '$w'")
    }
  }

  test("native document kernel == reference doc encode over the whole corpus") {
    val docs = graft.Tables.documents(spark, sf0001)
    val trained = Bpe.train(docs, "text", 24)
    val got = docs.select(col("doc_id"),
        Bpe.encodeTokens(col("text"), trained.merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val raw = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
    assert(raw.nonEmpty)
    raw.foreach { case (id, text) =>
      assert(got(id) == Bpe.referenceEncodeDoc(text, trained.merges),
        s"doc $id: native != reference")
    }
  }

  test("document kernel edge semantics: trim/split/empty-word contract") {
    val trained = Bpe.train(graft.Tables.documents(spark, sf0001), "text", 24)
    val edgy = Seq("", " ", "   ", "\t", " a  b ", "a\t\tb", " the the ")
    val got = edgy.toDF("text")
      .select(Bpe.encodeTokens(col("text"), trained.merges).as("toks"))
      .as[Seq[String]].collect().toSeq
    assert(got == edgy.map(t => Bpe.referenceEncodeDoc(t, trained.merges)))
  }

  test("memo cap engages on a high-entropy vocabulary: bounded size, correct output") {
    // r13 (verdict ask): sf1 telemetry shows puts=62 on a 31-word corpus
    // vocabulary — the MemoCap bound had never engaged in production, so
    // its admission-stop path was untested. This corpus has MORE distinct
    // words than the cap (each appearing twice), forcing the bound to
    // bind: the memo must stop admitting (puts ≈ cap, a put DEFICIT vs
    // misses — the documented cap signal), stay bounded, degrade the hit
    // rate below the unbounded 0.5, and still encode every document
    // identically to the textbook reference (un-admitted words re-encode
    // per occurrence; output must not change).
    val cap = BpeEncodeTokens.MemoCap
    val nWords = cap + 14464 // 80k distinct > cap
    val trained = Bpe.train(graft.Tables.documents(spark, sf0001), "text", 24)
    val rnd = new scala.util.Random(23)
    val words = scala.collection.mutable.LinkedHashSet.empty[String]
    while (words.size < nWords)
      words += (1 to (6 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    // every word exactly twice, shuffled: unbounded memo → hit rate 0.5
    val stream = rnd.shuffle((words.toSeq ++ words.toSeq))
    val docs = stream.grouped(100).map(_.mkString(" ")).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    BpeEncodeTokens.resetMemoStats()
    val got = docs.select(col("doc_id"),
        Bpe.encodeTokens(col("text"), trained.merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    val (hits, misses, puts) = BpeEncodeTokens.memoStats()
    val total = hits + misses
    assert(total == 2L * nWords, s"every word instance must be counted: $total")
    // bounded admission: puts reaches the cap and stops (the size check is
    // a soft bound — concurrent boundary races may overshoot by <= threads)
    assert(puts >= cap && puts <= cap + 64,
      s"puts=$puts must sit at the cap ($cap): bound did not engage or overshot")
    // the cap signal: misses exceed puts (un-admitted words re-miss)
    assert(misses > puts, s"put deficit expected: misses=$misses puts=$puts")
    // measured degradation: below the unbounded 0.5, above the no-memo 0
    val rate = hits.toDouble / total
    assert(rate < 0.5 && rate > 0.05, f"hit rate $rate%.3f out of expected band")
    info(f"memo cap engaged: hits=$hits misses=$misses puts=$puts rate=$rate%.3f (unbounded would be 0.500)")
    // correctness is unconditional: cap admission loss must never change
    // a single token
    val raw = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
    raw.foreach { case (id, text) =>
      assert(got(id) == Bpe.referenceEncodeDoc(text, trained.merges),
        s"doc $id: capped-memo encode != reference")
    }
  }

  test("merges are non-trivial at sf0.001: subword splits survive (not all words fused)") {
    val trained = Bpe.train(graft.Tables.documents(spark, sf0001), "text", 24)
    assert(trained.merges.length == 24, "expected the full merge budget to train")
    val words = trained.wordFreq.map(_._1)
    val multi = words.count(w => Bpe.referenceEncodeWord(w, trained.merges).length > 1)
    assert(multi > 0, "degenerate: every word fused to a single token")
    val fused = words.count(w =>
      w.length > 1 && Bpe.referenceEncodeWord(w, trained.merges).length == 1)
    assert(fused > 0, "degenerate: no word reached a whole-word token")
  }

  test("vocabCap truncation is DETECTED (complete=false) — the oracle-emit guard") {
    val t = Bpe.train(graft.Tables.documents(spark, sf0001), "text",
      numMerges = 4, vocabCap = 5)
    assert(!t.complete)
    assert(t.wordFreq.length == 5)
  }
}
