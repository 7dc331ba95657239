package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-envelope probe (round-10 evidence run, not a test): executes the
  * dedup + near-dup + ANN family once at `SPARK_GRAFT_SF_DIR` (meant for a
  * 10×-sf0.1 corpus) and reports, per query, wall seconds plus the
  * executor-side memory envelope from real task metrics — max
  * `peakExecutionMemory` across tasks (the per-task operator-memory
  * high-water mark: sorts, aggregates, join buffers) and total
  * memory/disk spill. The claim under test: no task's execution memory
  * grows with corpus size in the banded/posting paths (the r10 grid +
  * lazy-emitter bound), so a 10× corpus moves wall time, not peak.
  *
  * Run: SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
  *        sbt -batch "Test/runMain graft.EnvelopeProbe"
  */
object EnvelopeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var peak = 0L
    @volatile var spillMem = 0L
    @volatile var spillDisk = 0L
    @volatile var tasks = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          peak = math.max(peak, m.peakExecutionMemory)
          spillMem += m.memoryBytesSpilled
          spillDisk += m.diskBytesSpilled
          tasks += 1
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val family = Seq(
      "dd_normalized", "dd_simhash", "dd_hamming", "dd_sim_components",
      "dd_ngram_jaccard", "dd_ppjoin", "dd_jac_components",
      "dd_incremental", "dd_minhash_lsh", "dd_components", "dd_canonical",
      "dd_cosine_neardup", "dd_dup_windows", "dd_maximal_spans",
      "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
      "ann_hnsw_topk", "ann_ivfpq_topk",
      // r11 additions: all pure map / scalar-agg shapes — the envelope
      // claim is that their peaks track the scan, not the corpus
      "tx_bpe_encode", "sm_pack_bpe", "tx_quality_classifier",
      "ir_term_stats", "ir_bm25_topk", "ir_batch_bm25")
    println(f"${"query"}%-20s ${"sec"}%8s ${"rows"}%10s ${"peakTaskMB"}%11s ${"spillMB"}%8s")
    family.foreach { name =>
      peak = 0L; spillMem = 0L; spillDisk = 0L; tasks = 0L
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are queued (private bus — no flush API from here);
      // the count() above is synchronous and the bus drains in ms, so a
      // short sleep suffices for a probe
      Thread.sleep(500)
      println(f"$name%-20s $sec%8.2f $rows%10d ${peak / 1048576}%11d " +
        f"${(spillMem + spillDisk) / 1048576}%8d  tasks=$tasks")
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
