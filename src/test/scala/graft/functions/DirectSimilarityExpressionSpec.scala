package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.bio.SimilarityKernels

/** Native expression vs the kernel function: identical scores on random
  * inputs, and the plan stays inside whole-stage codegen (no ScalaUDF
  * node).
  */
class DirectSimilarityExpressionSpec extends SparkSpec {

  test("expression equals the kernel on 200 random windows") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(9)
    def dna(n: Int) = List.fill(n)("acgt"(rnd.nextInt(4))).mkString
    val rows = Seq.tabulate(200) { i =>
      val len = 5 + rnd.nextInt(30)
      (i, dna(len), dna(len))
    }
    val df = rows.toDF("id", "gene", "window")
    df.createOrReplaceTempView("dsim_test")
    val got = spark.sql(
      "SELECT id, direct_similarity_native(gene, window) AS s FROM dsim_test ORDER BY id")
      .as[(Int, Double)].collect()
    val want = rows.map { case (i, g, w) => (i, SimilarityKernels.directScore(g, w, 0)) }
    assert(got.toSeq === want)
  }

  test("codegen path: no ScalaUDF node, expression fuses into the project") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq(("acgt", "acgt")).toDF("g", "w")
    df.createOrReplaceTempView("dsim_plan")
    val plan = spark.sql("SELECT direct_similarity_native(g, w) FROM dsim_plan")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    assert(plan.contains("direct_similarity_native") || plan.contains("directsimilarity"))
    // and it actually evaluates through the generated code
    val v = spark.sql("SELECT direct_similarity_native('cc', 'tt')").collect().head.getDouble(0)
    assert(v === 2.0) // wobble: query 'c' matches subject 't'
  }
}
