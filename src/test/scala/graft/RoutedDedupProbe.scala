package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (r13): wall-time evidence for the productized dedup routing —
  * `dd_canonical` (exact pair table) vs `dd_canonical_routed` (digest
  * collapse → MinHash banding on reps → exact verify on survivors) on the
  * sf1 scale corpus and the duplicate-heavy sf1dup bracket. Two runs each
  * (min + max band, the r13 envelope treatment); full materialization via
  * the noop sink. Run:
  *   SPARK_GRAFT_CPUS=32 sbt -batch "Test/runMain graft.RoutedDedupProbe [dirs...]"
  */
object RoutedDedupProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sf1", "/tmp/sf1dup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    dirs.foreach { dir =>
      if (!java.nio.file.Files.exists(
          java.nio.file.Paths.get(dir, "documents.parquet"))) {
        println(s"[routed-probe] $dir missing, skipped")
      } else {
        Seq("dd_canonical", "dd_canonical_routed").foreach { name =>
          val runs = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(name)(spark, dir)
              .write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            spark.catalog.clearCache()
            graft.text.Dedup.clearPairTables()
            graft.text.Dedup.clearClassTables()
            System.gc()
            sec
          }
          println(f"[routed-probe] $dir $name%-22s min=${runs.min}%8.2f s  max=${runs.max}%8.2f s")
        }
      }
    }
    spark.stop()
  }
}
