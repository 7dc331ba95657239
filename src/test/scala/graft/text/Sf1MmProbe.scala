package graft.text

/** Dev-only probe: multimodal family wall at sf1 before adding envelope rows. */
object Sf1MmProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .appName("sf1-mm").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    for (name <- Seq("mm_video_neardup", "mm_image_decode", "mm_audio_neardup")) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      println(f"RESULT $name sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
