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
  * IRLS loop runs sequentially over that fixed order with
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

  /** The five feature columns, in weight order w1..w5 — one compiled
    * kernel pass ([[graft.functions.QualityFeatures]]) projected by
    * index; the five GetArrayItems share the kernel subtree, so codegen's
    * common-subexpression elimination computes it once per row. Bit-equal
    * to [[featureColumnsSpec]] (QualityClassifierSpec differential).
    */
  def featureColumns(text: Column): Seq[Column] = {
    import org.apache.spark.sql.graft.GraftColumnBridge.{column => colOf, expression}
    val f = colOf(graft.functions.QualityFeatures(expression(text), stopwords))
    (1 to NumFeatures).map(j => element_at(f, j))
  }

  /** The Column-expression form of [[featureColumns]] — kept as the
    * executable spec [[featureSqlTerms]] mirrors; tests assert the native
    * kernel equals it bit-for-bit. Exact IEEE arithmetic only — every
    * term is an int-derived double ratio.
    */
  def featureColumnsSpec(text: Column): Seq[Column] = {
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

  /** Logistic-regression training over the bounded sample by IRLS
    * (Newton-Raphson with a small ridge for near-separable stability —
    * full-batch gradient descent needs thousands of passes on this
    * conditioning; Newton converges in ~25). Every step is sequential
    * driver arithmetic in a fixed order, so the result is bit-stable.
    * Returns `[w0 (bias), w1..w5]`.
    */
  def train(docs: DataFrame, textCol: String, iters: Int = 25,
      ridge: Double = 1e-3, sampleCap: Int = 8192): Array[Double] = {
    require(iters > 0 && ridge > 0 && sampleCap > 0)
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
    val dim = NumFeatures + 1
    val w = new Array[Double](dim)
    var it = 0
    while (it < iters) {
      // Newton step: solve (X'WX + ridge·I) Δ = X'(y - p)
      val h = Array.ofDim[Double](dim, dim)
      val g = new Array[Double](dim)
      var r = 0
      while (r < n) {
        var z = 0.0
        var j = 0
        while (j < dim) { z += w(j) * x(r)(j); j += 1 }
        val p = 1.0 / (1.0 + StrictMath.exp(-z))
        val wt = p * (1.0 - p)
        val d = y(r) - p
        j = 0
        while (j < dim) {
          g(j) += d * x(r)(j)
          var k2 = 0
          while (k2 < dim) { h(j)(k2) += wt * x(r)(j) * x(r)(k2); k2 += 1 }
          j += 1
        }
        r += 1
      }
      var j = 0
      while (j < dim) { h(j)(j) += ridge; j += 1 }
      val delta = solve(h, g)
      j = 0
      while (j < dim) { w(j) += delta(j); j += 1 }
      it += 1
    }
    w
  }

  /** Gaussian elimination with partial pivoting — deterministic, 6×6. */
  private def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    val m = Array.tabulate(n)(i => a(i).clone())
    val v = b.clone()
    var col = 0
    while (col < n) {
      var piv = col
      var row = col + 1
      while (row < n) {
        if (math.abs(m(row)(col)) > math.abs(m(piv)(col))) piv = row
        row += 1
      }
      val tmp = m(col); m(col) = m(piv); m(piv) = tmp
      val tv = v(col); v(col) = v(piv); v(piv) = tv
      require(m(col)(col) != 0.0, "singular IRLS system (ridge too small?)")
      row = col + 1
      while (row < n) {
        val f = m(row)(col) / m(col)(col)
        var k2 = col
        while (k2 < n) { m(row)(k2) -= f * m(col)(k2); k2 += 1 }
        v(row) -= f * v(col)
        row += 1
      }
      col += 1
    }
    val out = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = v(i)
      var k2 = i + 1
      while (k2 < n) { s -= m(i)(k2) * out(k2); k2 += 1 }
      out(i) = s / m(i)(i)
      i -= 1
    }
    out
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
