package graft.text

/** Dev-only probe: the exact all-pairs sf1 tier (the r15 `weak` marking) —
  * wall + GC + spill + listener drops per run, Bench-envelope measurement
  * shape, so the variance story can be reconciled on one machine state.
  */
object Sf1ExactTierProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.scheduler.listenerbus.eventqueue.capacity", "200000")
      .appName("sf1-exact").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
    @volatile var spill = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) spill += m.memoryBytesSpilled + m.diskBytesSpilled
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    val names = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").toSeq)
      .getOrElse(Seq("dd_ngram_jaccard"))
    for (name <- names; run <- 1 to 3) {
      spill = 0L
      val drop0 = org.apache.spark.GraftListenerBridge
        .droppedEvents(spark.sparkContext)
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val gc = (gcMillis() - gc0) / 1e3
      Thread.sleep(500)
      val drops = org.apache.spark.GraftListenerBridge
        .droppedEvents(spark.sparkContext) - drop0
      println(f"RESULT $name run=$run sec=$sec%.2f gc_sec=$gc%.2f " +
        f"spill_mb=${spill / 1048576} drops=$drops")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
