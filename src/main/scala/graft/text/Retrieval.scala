package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval: BM25 top-k over the document corpus — the keyword
  * half of the similarity-search family (the ANN gates are the embedding
  * half). A training-data pipeline runs this shape for targeted corpus
  * audits ("show me the docs this query would retrieve") and
  * decontamination triage.
  *
  * Scale shape: NO inverted index is materialized — for a fixed query the
  * score is a pure per-document map (per-term tf via an array filter over
  * the token array, document length, a handful of broadcast scalars), so
  * the whole retrieval is scan → map → TakeOrdered(k). The only driver
  * state is the per-term (df, idf) vector and the two corpus scalars
  * (N, total token count) — one 1-row aggregate collect, bounded by the
  * query length, never by the corpus.
  *
  * Cross-engine float discipline: BM25's only transcendental is
  * `ln` inside idf — libm-variant across engines, so the three idf values
  * are computed ONCE on the driver ([[StrictMath.log]]) and embedded as
  * double literals in BOTH the Spark scoring column and the DuckDB oracle
  * (the IVF embedded-centroid pattern). Everything else — tf, document
  * length, avgdl (exact-integer division), the saturation fraction, the
  * weighted sum — is the same left-associated IEEE +,*,/ tree in both
  * engines, so scores match bit-for-bit and the e6 fixed-point gate
  * rounding cannot straddle. df/cf themselves get an independent
  * pure-counting oracle (`ir_term_stats`), so idf's INPUTS are verified
  * even though the `ln` itself is pinned by construction.
  */
object Retrieval {

  /** The benchmark query (literal terms, fixed across SFs). */
  val QueryTerms: Seq[String] = Seq("dup", "spark", "window")

  val K1 = 1.2
  val B = 0.75

  /** Per-term raw term frequency over the whitespace token array. */
  private def tfCol(toks: Column, term: String): Column =
    size(filter(toks, x => x === lit(term)))

  /** (df, cf) per query term plus the corpus scalars, in one aggregate
    * pass (a 1-row collect, query-length-bounded).
    */
  final case class TermStats(
      n: Long, totalTokens: Long, perTerm: Seq[(String, Long, Long)])

  def termStats(docs: DataFrame, textCol: String): TermStats = {
    val toks = TextOps.whitespaceTokens(col(textCol))
    val aggs =
      count(lit(1)).as("n") +:
      sum(size(toks).cast("long")).as("tot") +:
      QueryTerms.flatMap { t =>
        Seq(sum(when(tfCol(toks, t) > 0, 1L).otherwise(0L)).as(s"df_$t"),
          sum(tfCol(toks, t).cast("long")).as(s"cf_$t"))
      }
    val row = docs.agg(aggs.head, aggs.tail: _*).collect()(0)
    TermStats(row.getLong(0), row.getLong(1),
      QueryTerms.zipWithIndex.map { case (t, i) =>
        (t, row.getLong(2 + 2 * i), row.getLong(3 + 2 * i))
      })
  }

  /** Lucene-form idf from the driver: `ln((N - df + 0.5)/(df + 0.5) + 1)`.
    * StrictMath so the value is host-independent.
    */
  def idf(n: Long, df: Long): Double =
    StrictMath.log((n - df + 0.5) / (df + 0.5) + 1.0)

  /** The BM25 score column for the fixed query: idf values as literals,
    * the rest exact IEEE arithmetic mirrored term-for-term by
    * [[scoreSql]].
    */
  def scoreColumn(textCol: Column, idfs: Seq[(String, Double)],
      avgdl: Double): Column = {
    val toks = TextOps.whitespaceTokens(textCol)
    val dl = size(toks).cast("double")
    val terms = idfs.map { case (t, w) =>
      val tf = tfCol(toks, t).cast("double")
      lit(w) * ((tf * lit(K1 + 1)) /
        (tf + lit(K1) * (lit(1 - B) + lit(B) * (dl / lit(avgdl)))))
    }
    terms.reduceLeft(_ + _)
  }

  /** The same score as DuckDB SQL over `$w` (the tokensSql array) — the
    * identical expression tree, idf literals included.
    */
  def scoreSql(w: String, idfs: Seq[(String, Double)], avgdl: Double): String = {
    val dl = s"CAST(len($w) AS DOUBLE)"
    val terms = idfs.map { case (t, wt) =>
      val tf = s"CAST(len(list_filter($w, x -> x = '$t')) AS DOUBLE)"
      s"""(${wt} * (($tf * ${K1 + 1}) /
          ($tf + $K1 * (${1 - B} + $B * ($dl / $avgdl)))))"""
    }
    terms.reduceLeft((a, b) => s"($a + $b)")
  }

  /** avgdl as the exact-integer IEEE division both engines perform. */
  def avgdlOf(stats: TermStats): Double =
    stats.totalTokens.toDouble / stats.n.toDouble

  /** Top-k retrieval: scan → map score → TakeOrdered(k). Ties break to
    * the lower doc_id. Returns (rank, doc_id, score_e6).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      idfs: Seq[(String, Double)], avgdl: Double, k: Int): DataFrame = {
    val scored = docs.select(col(idCol),
      scoreColumn(col(textCol), idfs, avgdl).as("score"))
    scored
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol),
        floor(col("score") * lit(1000000.0) + lit(0.5)).cast("long")
          .as("score_e6"))
  }
}
