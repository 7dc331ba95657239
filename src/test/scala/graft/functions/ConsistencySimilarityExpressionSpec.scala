package graft.functions

import graft.SparkSpec
import graft.bio.SimilarityKernels

/** Native X3 expression vs the kernel: identical scores on random inputs
  * across patience values (codegen path included), and no ScalaUDF node
  * in the plan.
  */
class ConsistencySimilarityExpressionSpec extends SparkSpec {

  test("expression equals the kernel on 300 random (gene, window, patience)") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(41)
    def dna(n: Int) = List.fill(n)("acgt"(rnd.nextInt(4))).mkString
    val rows = Seq.tabulate(300) { i =>
      val len = 1 + rnd.nextInt(40)
      (i, dna(len), dna(len), rnd.nextInt(5))
    }
    val df = rows.toDF("id", "gene", "window", "p")
    df.createOrReplaceTempView("csim_test")
    val got = spark.sql(
      "SELECT id, consistency_similarity_native(gene, window, p) AS s FROM csim_test ORDER BY id")
      .as[(Int, Double)].collect()
    val want = rows.map { case (i, g, w, p) =>
      (i, SimilarityKernels.consistencyScore(g, w, 0, p).score)
    }
    assert(got.toSeq === want)
  }

  test("codegen path: no ScalaUDF node; bridged-run semantics hold") {
    GraftExtensions.register(spark)
    val plan = spark.sql(
      "SELECT consistency_similarity_native('acgt', 'acgt', 2)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // aaXaaXaa with patience 2 bridges both gaps: score = 6 matches
    val v = spark.sql(
      "SELECT consistency_similarity_native('aagaagaa', 'aattaatt', 2)")
      .collect().head.getDouble(0)
    assert(v === SimilarityKernels.consistencyScore("aagaagaa", "aattaatt", 0, 2).score)
  }
}
