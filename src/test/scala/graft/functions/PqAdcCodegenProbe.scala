package graft.functions

/** Dev-only probe: prove pq_adc_native's generated code COMPILES (a janino
  * failure silently falls back to interpreted eval and specs still pass).
  */
object PqAdcCodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("adc-codegen")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    import spark.implicits._
    GraftExtensions.register(spark)
    val df = Seq((1.0, Seq.fill(32)(0.5), Array[Byte](0, 1)))
      .toDF("c", "lut", "code")
    df.createOrReplaceTempView("adc_cg")
    val v = spark.sql("SELECT pq_adc_native(c, lut, code, 16) FROM adc_cg")
      .collect().head.getDouble(0)
    assert(v == 2.0, s"got $v")
    println("RESULT codegen-only path OK")
    spark.stop()
  }
}
