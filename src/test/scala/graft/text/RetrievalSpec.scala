package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 retrieval: idf arithmetic, ranking behavior on a planted frame,
  * and stats parity with a driver-side recount.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("idf: Lucene form, monotone decreasing in df, hand value") {
    assert(Retrieval.idf(1000, 10) > Retrieval.idf(1000, 100))
    assert(Retrieval.idf(1000, 100) > Retrieval.idf(1000, 999))
    // ln((1000 - 10 + 0.5)/(10 + 0.5) + 1)
    assert(Retrieval.idf(1000, 10) ==
      StrictMath.log((990.5 / 10.5) + 1.0))
    assert(Retrieval.idf(10, 10) > 0.0, "idf stays positive at df = N")
  }

  test("term stats match a driver-side recount at sf0.001") {
    val docs = graft.Tables.documents(spark, sf0001)
    val stats = Retrieval.termStats(docs, "text")
    val raw = docs.select("text").as[String].collect()
    assert(stats.n == raw.length)
    val tokLists = raw.map(_.trim.split("\\s+").toSeq)
    assert(stats.totalTokens == tokLists.map(_.length.toLong).sum)
    Retrieval.QueryTerms.foreach { t =>
      val df = tokLists.count(_.contains(t)).toLong
      val cf = tokLists.map(_.count(_ == t).toLong).sum
      val got = stats.perTerm.find(_._1 == t).get
      assert((got._2, got._3) == (df, cf), s"term '$t' df/cf mismatch")
    }
  }

  test("statsFromPostings rejects a postings frame built from other terms") {
    // r15 ADVICE: term_id -> term is an implicit contract with the
    // postingTf frame the caller passes; a diverged term list must fail
    // loudly, not silently mis-attribute df/cf.
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta"))
      .toDF("doc_id", "text")
    val wide = Retrieval.postingTf(docs, "doc_id", "text",
      Seq("alpha", "beta", "delta", "gamma"))
    val err = intercept[IllegalArgumentException] {
      Retrieval.statsFromPostings(docs, "text", wide, Seq("alpha", "beta"))
    }
    assert(err.getMessage.contains("different term list"))
    // the matched contract still works and agrees with observedStats
    val terms = Seq("beta", "alpha")
    val post = Retrieval.postingTf(docs, "doc_id", "text",
      terms.distinct.sorted)
    val a = Retrieval.statsFromPostings(docs, "text", post, terms)
    val b = Retrieval.observedStats(docs, "doc_id", "text", terms)
    assert(a == b)
  }

  test("ranking: term-dense docs beat term-free docs; ties break to lower id") {
    val docs = Seq(
      (1L, "dup dup spark window filter"),   // all three terms, dense
      (2L, "spark join filter table row"),   // one term
      (3L, "join filter table row merge"),   // no query terms
      (4L, "dup dup spark window filter"))   // identical to doc 1 → tie
      .toDF("doc_id", "text")
    val stats = Retrieval.termStats(docs, "text")
    val idfs = stats.perTerm.map { case (t, df, _) => (t, Retrieval.idf(stats.n, df)) }
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", idfs,
        Retrieval.avgdlOf(stats), k = 4)
      .as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 4L, 2L, 3L),
      s"unexpected ranking: $got")
    assert(got(0)._2 == got(1)._2, "identical docs must tie exactly")
    assert(got(2)._2 > got(3)._2)
  }

  test("batch BM25 == a from-first-principles driver reference at sf0.001") {
    val docs = graft.Tables.documents(spark, sf0001)
    val allTerms = Retrieval.QueryBatch.flatMap(_._2).distinct.sorted
    val stats = Retrieval.termStats(docs, "text", allTerms)
    val idfs = stats.perTerm.map { case (t, df, _) => (t, Retrieval.idf(stats.n, df)) }
    val idfMap = idfs.toMap
    val avgdl = Retrieval.avgdlOf(stats)
    val got = Retrieval.batchBm25TopK(docs, "doc_id", "text",
        Retrieval.QueryBatch, idfs, avgdl, k = 10)
      .as[(Int, Int, Long, Long)].collect().toSeq
    // plain-JVM reference: same fixed-point part arithmetic, naive loops
    val raw = docs.select("doc_id", "text").as[(Long, String)].collect()
    val want = Retrieval.QueryBatch.flatMap { case (qid, terms) =>
      val scored = raw.flatMap { case (id, text) =>
        val toks = {
          var lo = 0; var hi = text.length
          while (lo < hi && text.charAt(lo) == ' ') lo += 1
          while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
          text.substring(lo, hi).split("\\s+").toSeq
        }
        val dl = toks.length.toDouble
        val parts = terms.flatMap { t =>
          val tf = toks.count(_ == t).toDouble
          if (tf == 0) None
          else Some(math.floor(idfMap(t) * ((tf * (Retrieval.K1 + 1)) /
            (tf + Retrieval.K1 * ((1 - Retrieval.B) +
              Retrieval.B * (dl / avgdl)))) * 1000000000.0 + 0.5).toLong)
        }
        if (parts.isEmpty) None else Some((id, parts.sum))
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(10).zipWithIndex
        .map { case ((id, s), i) => (qid, i + 1, id, s) }
    }
    assert(got == want, s"batch BM25 diverged from the reference\n got=$got\nwant=$want")
  }

  test("score column matches scoreSql structure: a zero-tf doc scores 0") {
    val docs = Seq((1L, "join filter merge")).toDF("doc_id", "text")
    val s = Retrieval.scoreColumn(col("text"),
      Retrieval.QueryTerms.map(t => (t, 1.0)), avgdl = 3.0)
    assert(docs.select(s).as[Double].collect().head == 0.0)
  }
}
