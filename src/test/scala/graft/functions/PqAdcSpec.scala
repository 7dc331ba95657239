package graft.functions

import graft.SparkSpec

/** Native ADC accumulation vs a reference ascending-subspace fold:
  * bit-identical doubles on random LUT/code rows (fold order matters —
  * the ann_ivfpq oracle compares exact doubles), layout-mismatch loudness,
  * null propagation, and no ScalaUDF in the plan.
  */
class PqAdcSpec extends SparkSpec {

  test("expression equals the ascending-subspace fold bit-for-bit on 300 random rows") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(53)
    val m = 8; val ks = 16
    val rows = Seq.tabulate(300) { i =>
      val lut = Seq.fill(m * ks)(rnd.nextDouble() * 2 - 1)
      val code = Array.fill(m)(rnd.nextInt(ks).toByte)
      (i, rnd.nextDouble(), lut, code)
    }
    val df = rows.toDF("id", "celldot", "lut", "code")
    df.createOrReplaceTempView("adc_test")
    val got = spark.sql(
      s"SELECT id, pq_adc_native(celldot, lut, code, $ks) AS s " +
        "FROM adc_test ORDER BY id")
      .as[(Int, Double)].collect()
    val want = rows.map { case (i, c, lut, code) =>
      var s = c; var sub = 0
      while (sub < code.length) {
        s += lut(sub * ks + (code(sub) & 0xff)); sub += 1
      }
      (i, s)
    }
    assert(got.toSeq === want)
  }

  test("codegen path: no ScalaUDF; layout mismatch throws loud; nulls propagate") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq((1.0, Seq.fill(32)(0.5), Array[Byte](0, 1)))
      .toDF("c", "lut", "code")
    df.createOrReplaceTempView("adc_plan")
    val q = "SELECT pq_adc_native(c, lut, code, 16) FROM adc_plan"
    assert(!spark.sql(q).queryExecution.executedPlan.toString.contains("ScalaUDF"))
    assert(spark.sql(q).collect().head.getDouble(0) === 1.0 + 0.5 + 0.5)
    // a LUT sized for the wrong model must fail, not fold a prefix
    val bad = intercept[Exception] {
      spark.sql("SELECT pq_adc_native(c, lut, code, 8) FROM adc_plan").collect()
    }
    assert(bad.getMessage != null)
    // nulls propagate (nullIntolerant)
    val nulled = spark.sql(
      "SELECT pq_adc_native(CAST(NULL AS DOUBLE), lut, code, 16) FROM adc_plan")
      .collect().head
    assert(nulled.isNullAt(0))
  }
}
