package graft.ann

import org.apache.spark.sql.functions._

/** Dev-only probe (r18.5): standing-index maintenance economics at the
  * 100× bracket (2M×64, /tmp/sf100) — the sf10dup bench arm's decade-up
  * twin. Build once at the shipped config, serve a batch, then measure
  * a 32-row and a 1024-row insert (ids shifted past max — disjoint by
  * construction; checkIds stays ON, the production default) and one
  * post-insert batch. The claim under test: insert cost tracks CELLS
  * HIT (≤ batch size, × sub-shards per cell), not corpus size — at 64
  * cells × ~2 sub-shards a 32-row structureless insert rebuilds ≲ half
  * the sub-shards while a full build pays all of them plus the trainer.
  *
  * Env: SPARK_GRAFT_SF100_DIR (default /tmp/sf100).
  */
object HnswIndexMaintenanceProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .appName("index-maintenance").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "/tmp/sf100")
    val emb = graft.Tables.embeddings(spark, d)
    val nEmb = emb.agg(max("vec_id")).head.getLong(0) + 1L
    println(s"MAINT corpus rows=$nEmb dir=$d")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"MAINT $label sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      r
    }
    def batch(idx: Ann.HnswRoutedIndex, label: String, lo: Long): Unit =
      timed(label) {
        idx.topK(col("vec_id") >= lo && col("vec_id") < lo + 20L,
            k = 5, nProbeCells = 32)
          .write.format("noop").mode("overwrite").save()
      }
    def shifted(k: Int, off: Long) = emb.where(col("vec_id") < k)
      .withColumn("vec_id", col("vec_id") + lit(off))

    val idx = timed("build")(Ann.buildHnswRoutedIndex(
      emb, "vec_id", "embedding", numCells = 64, m = 16, ef = 128))
    println(s"MAINT num_shards=${idx.numShards}")
    batch(idx, "batch_pre", 0L)
    val idx32 = timed("insert32")(idx.insert(shifted(32, nEmb)))
    val idx1k = timed("insert1k")(idx32.insert(shifted(1024, nEmb + 1024L)))
    println(s"MAINT num_shards_after=${idx1k.numShards}")
    batch(idx1k, "batch_post", nEmb)
    idx.release(); idx32.release(); idx1k.release()
    spark.stop()
  }
}
