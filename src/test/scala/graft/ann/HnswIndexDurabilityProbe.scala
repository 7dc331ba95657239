package graft.ann

import org.apache.spark.sql.functions._

/** Dev-only probe (r19): the durability + two-level stanzas of the sf100
  * bench envelope, run standalone at the 100× bracket (2M×64,
  * /tmp/sf100) — validates the new `ann_hnsw_index_prod` code path
  * before a full bench run and measures the two r18 verdict asks:
  *
  * 1. save/load economics (ask #1): load must sit FAR under rebuild —
  *    the restart story of the standing index. Bit-identity asserted at
  *    this bracket too (full shard-fingerprint map equality after a
  *    cache-cleared reload).
  * 2. the two-level standing build at a >4k-equivalent cell count
  *    (ask #3): 80×64 = 5120 cells, past the flat quantizer's measured
  *    assignment cliff (841 s flat at 10240-cell scale; ~2√C dots here),
  *    trainCap scaled to the ≥8-rows-per-child floor.
  *
  * Env: SPARK_GRAFT_SF100_DIR (default /tmp/sf100).
  */
object HnswIndexDurabilityProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .appName("index-durability").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "/tmp/sf100")
    val emb = graft.Tables.embeddings(spark, d)
    println(s"DURA corpus rows=${emb.count()} dir=$d")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"DURA $label sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      r
    }
    val saveDir = "/tmp/sf100_hnsw_index_probe"

    val idx = timed("build")(Ann.buildHnswRoutedIndex(
      emb, "vec_id", "embedding", numCells = 128, m = 16, ef = 128))
    println(s"DURA num_shards=${idx.numShards}")
    val fpBefore = idx.shardFingerprints
    timed("save")(idx.save(saveDir))
    idx.release(); spark.catalog.clearCache(); System.gc()
    val loaded = timed("load")(Ann.loadHnswRoutedIndex(spark, saveDir))
    assert(loaded.shardFingerprints == fpBefore,
      "DURA FAIL: reloaded fingerprints diverged at the 2M bracket")
    println("DURA fingerprints=identical")
    timed("batch_post_load") {
      loaded.topK(col("vec_id") < 20, k = 5, nProbeCells = 64)
        .write.format("noop").mode("overwrite").save()
    }
    loaded.release(); spark.catalog.clearCache(); System.gc()
    scala.util.Try {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(saveDir))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }

    val quant = timed("two_level_train")(Ann.trainIvfCentroidsTwoLevel(
      emb, "vec_id", "embedding", numSuper = 80, cellsPerSuper = 64,
      nProbeSuper = 20, trainCap = 40960))
    val idx2 = timed("two_level_build")(Ann.buildHnswRoutedIndexTwoLevel(
      emb, "vec_id", "embedding", quant, m = 16, ef = 128))
    println(s"DURA two_level_num_shards=${idx2.numShards}")
    timed("two_level_batch") {
      idx2.topK(col("vec_id") < 20, k = 5, nProbeCells = 640)
        .write.format("noop").mode("overwrite").save()
    }
    idx2.release()
    spark.stop()
  }
}
