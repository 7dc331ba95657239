package graft.plans

/** Dev-only probe: j1/j8 wall + GC at the sf10 bracket — the r15 verdict
  * watch item (5.6–9.2 s GC, 25–40% of j1 wall, blamed on the stab-join's
  * map-side row copies). Replicates the Bench sf10 envelope's measurement
  * shape (noop write, best-of-2, GC from the collector MX beans).
  */
object Sf10J1Probe {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_SHUFFLE_PARTITIONS: the j8 sort-spill lever (r17
    // verdict ask #5) — the gate's global ORDER BY plans as a
    // RangePartitioning exchange + per-partition external sort, so
    // partition count decides whether each task's sort fits memory or
    // spills; A/B 32 vs 256 quantifies the sizing rule the COVERAGE
    // adjudication cites.
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", shufParts)
      .appName("sf10-j1").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/tmp/sf10")
    @volatile var spill = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) spill += m.memoryBytesSpilled + m.diskBytesSpilled
        }
      })
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    val names = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("j1_range_join", "j8_range_classify"))
    for (name <- names; run <- 1 to 2) {
      spill = 0L
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val gc = (gcMillis() - gc0) / 1e3
      Thread.sleep(500)
      println(f"RESULT $name run=$run shuffle_partitions=$shufParts " +
        f"sec=$sec%.2f gc_sec=$gc%.2f gc_pct=${100 * gc / sec}%.0f " +
        f"spill_mb=${spill / 1048576}")
      System.gc()
    }
    spark.stop()
  }
}
