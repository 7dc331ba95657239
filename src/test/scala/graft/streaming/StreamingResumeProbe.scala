package graft.streaming

import org.apache.spark.sql.functions._

/** Dev-only probe (r19): restart-recovery economics of the streaming
  * standing-index checkpoint at the 100× bracket (2M×64, /tmp/sf100) —
  * the measured counterpart of
  * [[StreamingOps.resumeStandingAnnIndex]]'s design claims:
  *
  *   - `ckpt_save` vs `replay-per-batch`: the checkpointEvery trade.
  *     At this bracket a save is expected CHEAPER than replaying even
  *     one small WAL batch (insert's per-batch floor is a sub-shard
  *     rebuild at corpus scale: 32 rows read 46 s in
  *     HnswIndexMaintenanceProbe r18.5, vs ~12 s save) — i.e. at 2M the
  *     optimal cadence is checkpoint-every-batch, and the knob exists
  *     for brackets/batches where inserts are cheaper than saves.
  *   - `resume_total` (load + WAL replay of one upsert batch + one
  *     delete batch) vs `rebuild_net` (what a restart pays WITHOUT a
  *     checkpoint): resume must win, and bit-identity with the rebuilt
  *     reference is asserted (the same fingerprint contract as the
  *     maintenance gates).
  *
  * The WAL layout is written directly in the on-disk format the
  * streaming loop produces (`batch=<id>` / `deletes_batch=<id>` under
  * the snapshot dir, `ckpt=<id>` + commit marker under the checkpoint
  * dir) — the probe measures the resume path, not MemoryStream
  * plumbing (StreamingOpsSpec pins that parity at gate scale).
  *
  * Env: SPARK_GRAFT_SF100_DIR (default /tmp/sf100).
  */
object StreamingResumeProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .appName("streaming-resume").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "/tmp/sf100")
    val full = graft.Tables.embeddings(spark, d)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    println(s"RESUME corpus rows=${full.count()} dir=$d")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"RESUME $label sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      r
    }
    def rmrf(p: String): Unit = scala.util.Try {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
      try walk.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
    val ckptDir = "/tmp/sf100_resume_ckpt"
    val walDir = "/tmp/sf100_resume_wal"
    rmrf(ckptDir); rmrf(walDir)

    // the streaming life this simulates: index checkpointed at batch 0,
    // then one 32-row upsert batch and one 32-id delete batch committed
    // before the crash — both live only in the WAL
    val upsertIds = (0L until 32L).toSeq
    val deleteIds = (1000000L until 1000032L).toSeq
    val base = full.where(not(col("vec_id").isInCollection(upsertIds)))
    val cents = graft.ann.Ann.trainIvfCentroids(
      full, "vec_id", "embedding", numCells = 128)
    val ckpt = timed("build_at_checkpoint")(
      graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
        base, "vec_id", "embedding", cents, m = 16, ef = 128))
    timed("ckpt_save")(ckpt.save(s"$ckptDir/ckpt=0"))
    // the commit marker writeCheckpoint appends (its on-disk contract)
    java.nio.file.Files.createFile(java.nio.file.Paths.get(
      s"$ckptDir/ckpt=0", "_GRAFT_CKPT_COMMIT"))
    ckpt.release(); spark.catalog.clearCache(); System.gc()

    full.where(col("vec_id").isInCollection(upsertIds))
      .write.mode("overwrite").parquet(s"$walDir/batch=1")
    full.where(col("vec_id").isInCollection(deleteIds)).select("vec_id")
      .write.mode("overwrite").parquet(s"$walDir/deletes_batch=2")

    val resumed = timed("resume_total")(
      StreamingOps.resumeStandingAnnIndex(spark, ckptDir, walDir))
    timed("batch_post_resume") {
      resumed.topK(col("vec_id") < 20, k = 5, nProbeCells = 64)
        .write.format("noop").mode("overwrite").save()
    }
    val fpResumed = resumed.shardFingerprints
    resumed.release(); spark.catalog.clearCache(); System.gc()

    // the alternative a restart pays with NO checkpoint: full rebuild
    // over the net corpus
    val net = full.where(not(col("vec_id").isInCollection(deleteIds)))
    val rebuilt = timed("rebuild_net")(
      graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
        net, "vec_id", "embedding", cents, m = 16, ef = 128))
    assert(fpResumed == rebuilt.shardFingerprints,
      "RESUME FAIL: resumed graphs diverged from the net rebuild at 2M")
    println("RESUME fingerprints=identical")
    rebuilt.release()
    rmrf(ckptDir); rmrf(walDir)
    spark.stop()
  }
}
