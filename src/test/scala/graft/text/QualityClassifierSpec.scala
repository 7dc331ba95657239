package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained quality classifier: training determinism (the precondition for
  * the literal-weights oracle), distillation quality against the
  * weak-label teacher, and the bounded-sample discipline.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sf0001)

  test("training is bit-identical at any partitioning (1 vs 32 partitions)") {
    val w1 = QualityClassifier.train(docs.repartition(1), "text")
    val w32 = QualityClassifier.train(docs.repartition(32), "text")
    assert(w1.toSeq == w32.toSeq,
      s"weights drifted with partitioning:\n  ${w1.toSeq}\n  ${w32.toSeq}")
  }

  test("training twice on the same frame is bit-identical (no hidden RNG)") {
    val a = QualityClassifier.train(docs, "text")
    val b = QualityClassifier.train(docs, "text")
    assert(a.toSeq == b.toSeq)
  }

  test("distillation: >=95% agreement with the teacher, both classes live") {
    val w = QualityClassifier.train(docs, "text")
    val scored = docs.select(
        QualityClassifier.weakLabel(col("text")).as("y"),
        (QualityClassifier.logitColumn(col("text"), w) >= 0.0)
          .cast("int").as("pred"))
      .as[(Double, Int)].collect()
    assert(scored.nonEmpty)
    val agree = scored.count { case (y, p) => y.toInt == p }
    val frac = agree.toDouble / scored.length
    assert(frac >= 0.95, f"agreement $frac%.3f below 0.95 (${scored.length} docs)")
    val pos = scored.count(_._2 == 1)
    assert(pos > 0 && pos < scored.length,
      s"degenerate classifier: $pos positive of ${scored.length}")
  }

  test("sample cap binds in the plan: tiny cap still trains, deterministically") {
    val a = QualityClassifier.train(docs, "text", sampleCap = 50)
    val b = QualityClassifier.train(docs.repartition(16), "text", sampleCap = 50)
    assert(a.toSeq == b.toSeq)
    assert(a.length == QualityClassifier.NumFeatures + 1)
  }

  test("native feature kernel equals the Column spec bit-for-bit") {
    import spark.implicits._
    // the logit oracle embeds weights as literals over the SPEC features,
    // so the kernel must reproduce each feature's IEEE double exactly —
    // compare with strict equality, no tolerance. Edge shapes: empty doc
    // (one empty token under split(-1)), tab-tailed doc (trailing empty
    // token), vertical-tab/form-feed (\s class parity), all-stopword,
    // long doc (length saturation clamps), punctuation-only
    val edge = Seq("", " ", "a\tb\t", "the of and to is", "x" * 3000,
      "mixedws\fforms\rhere", "!!! ??? ...", "the " * 250,
      // non-BMP (r13): supplementary chars count once in length/non-ws
      // ratios — the spec's length() is codepoint-based
      "caf\u00e9 \ud83d\ude00 the", "\ud83d\ude00\ud83d\ude00 of and")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val corpus = graft.Tables.documents(spark, sf001)
    Seq(edge, corpus).foreach { df =>
      val native = QualityClassifier.featureColumns(col("text"))
      val specF = QualityClassifier.featureColumnsSpec(col("text"))
      val bad = df.select(
          native.zipWithIndex.map { case (c, i) => c.as(s"n$i") } ++
          specF.zipWithIndex.map { case (c, i) => c.as(s"s$i") }: _*)
        .where((0 until QualityClassifier.NumFeatures)
          .map(i => col(s"n$i") =!= col(s"s$i")).reduce(_ || _))
        .count()
      assert(bad == 0L, "native features diverge from the Column spec")
    }
  }

  test("feature contract: Spark columns and SQL terms stay in lockstep") {
    // the two lists are maintained side by side; a drift in LENGTH is the
    // silent-mismatch case the oracle cannot catch (it would embed too few
    // terms) — pin it here
    assert(QualityClassifier.featureSqlTerms.length ==
      QualityClassifier.NumFeatures)
    assert(QualityClassifier.featureColumns(col("text")).length ==
      QualityClassifier.NumFeatures)
  }
}
