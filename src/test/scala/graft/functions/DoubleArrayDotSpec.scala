package graft.functions

import graft.SparkSpec

/** Native dot product vs a reference left-to-right fold: bit-identical
  * doubles on random vectors (fold order matters — the oracle compares
  * exact doubles), null propagation, and no ScalaUDF in the plan.
  */
class DoubleArrayDotSpec extends SparkSpec {

  test("expression equals the left-to-right fold bit-for-bit on 300 random pairs") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(47)
    def vec(n: Int): Seq[Double] = Seq.fill(n)(rnd.nextDouble() * 2 - 1)
    val rows = Seq.tabulate(300) { i =>
      val dim = 1 + rnd.nextInt(96)
      (i, vec(dim), vec(dim))
    }
    val df = rows.toDF("id", "a", "b")
    df.createOrReplaceTempView("dad_test")
    val got = spark.sql(
      "SELECT id, double_array_dot_native(a, b) AS d FROM dad_test ORDER BY id")
      .as[(Int, Double)].collect()
    val want = rows.map { case (i, a, b) =>
      var s = 0.0; var j = 0
      while (j < a.length) { s += a(j) * b(j); j += 1 }
      (i, s)
    }
    // exact equality — same fold order must give the same doubles
    assert(got.toSeq === want)
  }

  test("codegen path: no ScalaUDF; empty and null inputs") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
    df.createOrReplaceTempView("dad_plan")
    val plan = spark.sql("SELECT double_array_dot_native(a, b) FROM dad_plan")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    val v = spark.sql("SELECT double_array_dot_native(a, b) FROM dad_plan")
      .collect().head.getDouble(0)
    assert(v === 11.0)
    val empty = spark.sql(
      "SELECT double_array_dot_native(CAST(array() AS ARRAY<DOUBLE>), CAST(array() AS ARRAY<DOUBLE>))")
      .collect().head.getDouble(0)
    assert(empty === 0.0)
    val n = spark.sql(
      "SELECT double_array_dot_native(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))")
      .collect().head
    assert(n.isNullAt(0))
  }

  test("ragged vectors fail loud instead of folding a silent prefix") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT double_array_dot_native(array(1.0D, 2.0D), array(1.0D))")
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(
        _.contains("mismatched vector dimensions"))))
  }
}
