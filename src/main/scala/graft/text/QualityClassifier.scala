package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier (the fastText-style filter step of a web
  * training-data pipeline, distilled here from the repo's deterministic
  * quality heuristic): logistic regression over five SQL-expressible
  * document features, trained driver-side on a deterministic bounded
  * sample, applied corpus-wide as a pure map.
  *
  * Scale shape: training on a BOUNDED sample is the industrial recipe —
  * quality classifiers train on 10⁴-10⁵ labeled docs and score 10⁹; the
  * full-corpus stage is SCORING, which here is one codegen projection
  * (features + a literal-weight dot product), no shuffle, no UDF. The
  * sample is `orderBy(xxhash64(doc_id), doc_id).limit(cap)` — the same
  * bounded limit-in-plan collect discipline as `Ann.trainIvfCentroids`.
  *
  * Determinism (the oracle embeds the weights as literals, so training
  * must be bit-stable): the collected sample is re-sorted by doc_id, the
  * full-batch gradient loop runs sequentially over that fixed order with
  * [[StrictMath.exp]] (Math.exp may use CPU-variant intrinsics), and
  * every op downstream of training is +,*,/ on IEEE doubles — so the
  * same corpus yields the same weights on any partitioning and any host.
  *
  * Cross-engine exactness of the GATE (`tx_quality_classifier`): the
  * logit is a left-associated chain of IEEE +,*,/ over exact integer-
  * derived feature values — identical expression trees in Spark and
  * DuckDB evaluate bit-identically (no exp/ln anywhere in the scored
  * output; the sigmoid exists only inside training). [[featureColumns]]
  * and [[featureSqlTerms]] are maintained side by side as the single
  * contract.
  */
object QualityClassifier {

  val NumFeatures = 5 // plus the bias term; weights array length = 6

  private val stopwords = Seq("the", "a", "of", "and", "to", "is")

  /** The five feature columns, in weight order w1..w5. Exact IEEE
    * arithmetic only — every term is an int-derived double ratio.
    */
  def featureColumns(text: Column): Seq[Column] = {
    val toks = TextOps.whitespaceTokens(text)
    val n = size(toks)
    val nD = greatest(n, lit(1)).cast("double")
    Seq(
      // length saturation
      least(n / lit(200.0), lit(1.0)),
      // stopword ratio
      TextOps.stopwordHits(toks, stopwords) / nD,
      // alphabetic ratio
      length(regexp_replace(text, "[^a-zA-Z]", "")) /
        greatest(length(text), lit(1)).cast("double"),
      // distinct-token ratio
      size(array_distinct(toks)) / nD,
      // mean word length (whitespace-stripped chars per token), /10 scale
      length(regexp_replace(text, "\\s", "")) / nD / lit(10.0))
  }

  /** The SAME five features as DuckDB SQL terms (tokensSql contract). */
  def featureSqlTerms: Seq[String] = {
    val w = """regexp_split_to_array(trim(text), '\s+')"""
    val nD = s"CAST(GREATEST(len($w), 1) AS DOUBLE)"
    val stopList = stopwords.map(s => s"'$s'").mkString("[", ",", "]")
    Seq(
      s"LEAST(len($w) / 200.0, 1.0)",
      s"len(list_filter($w, t -> list_contains($stopList, t))) / $nD",
      s"""length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) /
          CAST(GREATEST(length(text), 1) AS DOUBLE)""",
      s"len(list_distinct($w)) / $nD",
      s"""length(regexp_replace(text, '\\s', '', 'g')) / $nD / 10.0""")
  }

  /** Weak label: the deterministic quality heuristic, thresholded — the
    * teacher the classifier distills.
    */
  def weakLabel(text: Column): Column =
    when(TextOps.qualityScore(text, stopwords) >= 0.4, 1.0).otherwise(0.0)

  /** Full-batch logistic-regression training over the bounded sample.
    * Returns `[w0 (bias), w1..w5]`.
    */
  def train(docs: DataFrame, textCol: String, iters: Int = 3000,
      lr: Double = 2.0, sampleCap: Int = 8192): Array[Double] = {
    require(iters > 0 && lr > 0 && sampleCap > 0)
    val feats = featureColumns(col(textCol))
    val rows = docs.select(
        (col("doc_id") +: weakLabel(col(textCol)) +: feats): _*)
      .orderBy(xxhash64(col("doc_id")), col("doc_id"))
      .limit(sampleCap)
      .collect()
      .sortBy(_.getLong(0)) // fixed gradient-fold order, sample-set-determined
    require(rows.nonEmpty, "quality-classifier training sample is empty")
    val n = rows.length
    val x = Array.ofDim[Double](n, NumFeatures + 1)
    val y = new Array[Double](n)
    var i = 0
    while (i < n) {
      x(i)(0) = 1.0
      y(i) = rows(i).getDouble(1)
      var j = 0
      while (j < NumFeatures) { x(i)(j + 1) = rows(i).getDouble(j + 2); j += 1 }
      i += 1
    }
    val w = new Array[Double](NumFeatures + 1)
    var it = 0
    while (it < iters) {
      val g = new Array[Double](NumFeatures + 1)
      var r = 0
      while (r < n) {
        var z = 0.0
        var j = 0
        while (j <= NumFeatures) { z += w(j) * x(r)(j); j += 1 }
        val p = 1.0 / (1.0 + StrictMath.exp(-z))
        val d = p - y(r)
        j = 0
        while (j <= NumFeatures) { g(j) += d * x(r)(j); j += 1 }
        r += 1
      }
      var j = 0
      while (j <= NumFeatures) { w(j) -= lr * g(j) / n; j += 1 }
      it += 1
    }
    w
  }

  /** The scored logit as a Column: `w0 + w1*f1 + … + w5*f5`,
    * left-associated exactly like [[logitSql]] — bit-identical
    * cross-engine.
    */
  def logitColumn(text: Column, w: Array[Double]): Column = {
    require(w.length == NumFeatures + 1)
    featureColumns(text).zipWithIndex.foldLeft(lit(w(0)): Column) {
      case (acc, (f, j)) => acc + lit(w(j + 1)) * f
    }
  }

  /** The same logit as DuckDB SQL (Double.toString round-trips bit-exactly
    * through DuckDB's parser — the centroid-literal precedent).
    */
  def logitSql(w: Array[Double]): String = {
    require(w.length == NumFeatures + 1)
    featureSqlTerms.zipWithIndex.foldLeft(w(0).toString) {
      case (acc, (f, j)) => s"($acc + ${w(j + 1)} * $f)"
    }
  }
}
