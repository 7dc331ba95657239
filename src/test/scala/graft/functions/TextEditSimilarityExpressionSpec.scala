package graft.functions

import graft.SparkSpec
import graft.bio.SimilarityKernels

/** Native expression vs the UDF-tier kernel: identical scores on random
  * inputs (DNA and English-ish text), and the plan stays inside
  * whole-stage codegen.
  */
class TextEditSimilarityExpressionSpec extends SparkSpec {

  test("expression equals textEditScore on 300 random (gene, window)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(17)
    def dna(n: Int) = List.fill(n)("acgt"(rnd.nextInt(4))).mkString
    def eng(n: Int) = List.fill(n)("abcdefgh t "(rnd.nextInt(11))).mkString
    val rows = Seq.tabulate(300) { i =>
      val len = 1 + rnd.nextInt(40)
      if (i % 2 == 0) (i, dna(len), dna(len)) else (i, eng(len), eng(len))
    }
    val df = rows.toDF("id", "gene", "window")
    df.createOrReplaceTempView("tedit_test")
    val got = spark.sql(
      "SELECT id, text_edit_similarity_native(gene, window) AS s FROM tedit_test ORDER BY id")
      .as[(Int, Double)].collect()
    val want = rows.map { case (i, g, w) => (i, SimilarityKernels.textEditScore(g, w, 0)) }
    assert(got.toSeq === want)
  }

  test("codegen path: no ScalaUDF; anchored-DP INF borders hold; prefix clamp") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(("acgt", "acgt")).toDF("g", "w")
    df.createOrReplaceTempView("tedit_plan")
    val plan = spark.sql("SELECT text_edit_similarity_native(g, w) FROM tedit_plan")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // anchored quirk: INF borders force the first chars to align
    val v = spark.sql("SELECT text_edit_similarity_native('ag', 'ga')").collect().head.getDouble(0)
    assert(v === SimilarityKernels.textEditScore("ag", "ga", 0))
    // window shorter than gene: scored over the common prefix, no throw
    val p = spark.sql("SELECT text_edit_similarity_native('acgtacgt', 'acg')").collect().head.getDouble(0)
    assert(p === SimilarityKernels.textEditScore("acg", "acg", 0))
  }
}
