package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev-only quick envelope for the j1/j8 rows at sf1 (same methodology as
  * Bench's sf1 section: best-of-2, noop sink, task-metric peak + spill).
  */
object Sf1J1Probe {
  def main(args: Array[String]): Unit = {
    val sf1Dir = "/tmp/sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var peak = 0L
    @volatile var spill = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          peak = math.max(peak, m.peakExecutionMemory)
          spill += m.memoryBytesSpilled + m.diskBytesSpilled
        }
      }
    })
    Seq("j1_range_join", "j8_range_classify").foreach { name =>
      var peakMax = 0L; var spillMax = 0L
      val runs = (1 to 2).map { _ =>
        peak = 0L; spill = 0L
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sf1Dir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        peakMax = math.max(peakMax, peak); spillMax = math.max(spillMax, spill)
        spark.catalog.clearCache(); System.gc()
        sec
      }
      println(f"[sf1-j] $name sec=${runs.min}%.2f sec_max=${runs.max}%.2f " +
        f"peakMB=${peakMax / 1048576} spillMB=${spillMax / 1048576}")
    }
    spark.stop()
  }
}
