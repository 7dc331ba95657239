package graft

import org.apache.spark.sql.SparkSession

/** r19 throwaway A/B harness: time named queries under session-conf
  * overrides (passed as k=v pairs), best-of-N with Bench's methodology
  * (noop sink, clearCache+gc between runs). Measurement aid only.
  *
  * Usage: runMain graft.AbProbe <sfDir> <q1,q2> <runs> [conf.k=v ...]
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val runs = args(2).toInt
    val confs = args.drop(3).map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
    confs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warmup as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val secs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache(); System.gc()
        t
      }
      println(f"[ab] $name best=${secs.min}%.3f runs=" +
        secs.map(s => f"$s%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
