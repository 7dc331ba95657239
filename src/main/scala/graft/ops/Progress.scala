package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** A6 progress tallies: the reference's throttled ETA logging (reference
  * `src/utils/factories/logger_factory.py:12-27` — print at most every
  * `timeDistance` seconds; remaining = elapsed / solve × (total − solve),
  * clamped at 0, rendered `HH:MM:SS`) re-expressed over Spark's native
  * progress machinery:
  *
  *   - [[EtaLogger]] is the throttle+ETA arithmetic itself (driver-side,
  *     deterministic, clock-injectable for tests);
  *   - [[Progress.attachStageProgress]] feeds it from a `SparkListener` —
  *     every operator gets solve/total = finished/total tasks per stage
  *     for free, no per-operator code (the idiomatic replacement for the
  *     reference's hand-carried counters);
  *   - [[Progress.accumulator]] is the op-level tally for finer units
  *     (windows scanned, records parsed): tasks `add()` into it and the
  *     driver logs it with the same [[EtaLogger]].
  */
final class EtaLogger(
    timeDistanceMs: Long = 5000,
    clock: () => Long = () => System.currentTimeMillis(),
    out: String => Unit = println) {

  private var startMs = 0L
  private var lastMs = -1L

  private def fmtTime(ms: Long): String =
    new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
      .format(new java.util.Date(ms))

  /** The reference's `info_with_expire_time`: reset timing on solve == 0,
    * print at most once per `timeDistanceMs`, append `remain HH:MM:SS`
    * once solve > 0 and total > 1.
    */
  def log(msg: String, solve: Long, total: Long): Unit = synchronized {
    val now = clock()
    if (solve == 0 || startMs == 0) { lastMs = -1L; startMs = now }
    if (lastMs < 0 || now - lastMs >= timeDistanceMs) {
      if (solve > 0 && total > 1) {
        val remainMs = math.max(0.0, (now - startMs).toDouble / solve * (total - solve))
        val s = (remainMs / 1000).toLong
        out(f"${fmtTime(now)}: $msg, remain ${s / 3600}%02d:${s / 60 % 60}%02d:${s % 60}%02d")
      } else out(s"${fmtTime(now)}: $msg")
      lastMs = now
    }
  }
}

object Progress {

  /** Op-level tally accumulator: tasks `add()` units of work (windows,
    * records, genes); commutative + associative, so task retries and
    * speculative copies fold correctly — the 100 TB-safe counter the
    * reference's in-process `solve_cnt` integers cannot be.
    */
  def accumulator(spark: SparkSession, name: String): LongAccumulator =
    spark.sparkContext.longAccumulator(name)

  /** Attach throttled per-stage progress+ETA logging for every job on the
    * session. Returns a handle; `close()` detaches the listener.
    */
  def attachStageProgress(
      spark: SparkSession,
      timeDistanceMs: Long = 5000,
      clock: () => Long = () => System.currentTimeMillis(),
      out: String => Unit = println): AutoCloseable = {
    // ONE EtaLogger (so one elapsed-time base and one throttle window) PER
    // STAGE: a shared logger's start timestamp would be the attach time,
    // inflating every later stage's ETA. Entries drop on stage completion,
    // so a long-lived session's maps stay bounded by in-flight stages.
    val loggers = new java.util.concurrent.ConcurrentHashMap[Int, EtaLogger]()
    val totals = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val done = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        totals.put(s.stageInfo.stageId, s.stageInfo.numTasks)
        done.put(s.stageInfo.stageId, new AtomicLong(0))
        loggers.put(s.stageInfo.stageId, new EtaLogger(timeDistanceMs, clock, out))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val solve = Option(done.get(t.stageId)).map(_.incrementAndGet()).getOrElse(0L)
        val total = totals.getOrDefault(t.stageId, 0)
        Option(loggers.get(t.stageId)).foreach(
          _.log(s"stage ${t.stageId}: $solve/$total tasks", solve, total.toLong))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        totals.remove(s.stageInfo.stageId)
        done.remove(s.stageInfo.stageId)
        loggers.remove(s.stageInfo.stageId)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    () => spark.sparkContext.removeSparkListener(listener)
  }
}
