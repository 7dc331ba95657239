package graft
import org.apache.spark.sql.SparkSession
import graft.text.Dedup
/** Dev probe: does a higher AQE initialPartitionNum cut the exact-family
  * sort spill at sf1 (84M candidate rows through 32 partitions)?
  */
object Sf1PartitionProbe {
  def main(args: Array[String]): Unit = {
    val init = sys.env.getOrElse("PROBE_INIT_PARTS", "32")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", init)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var spill = 0L
    @volatile var peak = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) { spill += m.memoryBytesSpilled + m.diskBytesSpilled
          peak = math.max(peak, m.peakExecutionMemory) }
      }
    })
    val docs = Tables.documents(spark, "/tmp/sf1")
    val hashed = Dedup.hashedShingleDocs(docs, "doc_id", "text")
    val t0 = System.nanoTime()
    val (c, s) = Dedup.jaccardCandidateStats(hashed, 0.5)
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"INIT=$init sec=$sec%.1f cands=$c survivors=$s " +
      f"spillMB=${spill / 1048576} peakMB=${peak / 1048576}")
    spark.stop()
  }
}
