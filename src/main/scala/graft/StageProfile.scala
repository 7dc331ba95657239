package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** r19 optimization tooling (guide §1.1/§7.1): run named gate queries with
  * a stage-completion listener so per-stage wall / executor time / GC /
  * shuffle bytes / spill / input bytes decompose where a query's seconds
  * go — the UI-is-disabled equivalent of the Stages tab.
  *
  * Usage: runMain graft.StageProfile <sfDir> <q1,q2,...> [runs]
  *
  * Timed exactly like Bench (noop sink, clearCache+System.gc between
  * runs); prints one [stage] line per completed stage of the LAST run
  * (earlier runs warm codegen/page cache, mirroring best-of-3).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.listenerbus.eventqueue.capacity", "200000"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var record = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          val wall = (for {
            s <- si.submissionTime; c <- si.completionTime
          } yield (c - s) / 1000.0).getOrElse(-1.0)
          lines.add(f"[stage] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"wall=$wall%7.2fs exec=${tm.executorRunTime / 1000.0}%7.1fs " +
            f"gc=${tm.jvmGCTime / 1000.0}%5.1fs " +
            f"in=${tm.inputMetrics.bytesRead / 1048576}%5dMB " +
            f"sr=${tm.shuffleReadMetrics.totalBytesRead / 1048576}%5dMB " +
            f"sw=${tm.shuffleWriteMetrics.bytesWritten / 1048576}%5dMB " +
            f"spill=${tm.diskBytesSpilled / 1048576}%4dMB  " +
            si.name.linesIterator.next().take(90))
        }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val secs = (1 to runs).map { r =>
        record = r == runs
        lines.clear()
        spark.sparkContext.setJobDescription(s"profile:$name run$r")
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        t
      }
      record = false
      Thread.sleep(300) // let the async listener bus drain
      println(s"== $name runs=" +
        secs.map(s => f"$s%.3f").mkString("[", ",", "]") +
        f" best=${secs.min}%.3f")
      lines.forEach(l => println(l))
    }
    spark.stop()
  }
}
