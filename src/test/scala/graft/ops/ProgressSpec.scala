package graft.ops

import scala.collection.mutable.ArrayBuffer

import graft.SparkSpec

/** A6 parity: the EtaLogger reproduces the reference's throttle + ETA
  * arithmetic (logger_factory.py), and the listener/accumulator plumbing
  * actually observes distributed work.
  */
class ProgressSpec extends SparkSpec {

  test("EtaLogger: throttle, reset-on-zero, and ETA arithmetic") {
    var now = 1_000_000L
    val lines = ArrayBuffer.empty[String]
    val log = new EtaLogger(timeDistanceMs = 5000, clock = () => now, lines += _)

    log.log("start", 0, 100)                 // solve=0: reset + plain print
    assert(lines.size == 1 && !lines.last.contains("remain"))

    now += 1000
    log.log("early", 10, 100)                // throttled (1s < 5s)
    assert(lines.size == 1)

    now += 9000                              // elapsed since start = 10s
    log.log("quarter", 25, 100)              // 10s/25×75 = 30s remaining
    assert(lines.size == 2 && lines.last.endsWith("quarter, remain 00:00:30"),
      lines.last)

    now += 5000                              // elapsed 15s, solve 50
    log.log("half", 50, 100)                 // 15/50×50 = 15s remaining
    assert(lines.last.endsWith("half, remain 00:00:15"), lines.last)

    now += 5000
    log.log("single", 1, 1)                  // total <= 1: no ETA clause
    assert(!lines.last.contains("remain"))
  }

  test("stage listener + accumulator observe a real distributed job") {
    // listener callbacks run on the bus thread — collect through a
    // thread-safe queue, not a locked-lambda-that-isn't (synchronized
    // around lambda CREATION would not lock the appends)
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val handle = Progress.attachStageProgress(spark, timeDistanceMs = 0,
      out = l => lines.add(l))
    val acc = Progress.accumulator(spark, "rows_seen")
    try {
      val ds = spark.range(0, 10000, 1, 8)
      ds.foreach(_ => acc.add(1))
      // wait for the listener bus to drain before asserting (the bus is
      // private API — poll the observable effect instead)
      import scala.jdk.CollectionConverters._
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
        !lines.asScala.exists(_.contains("8/8 tasks"))) Thread.sleep(50)
      assert(acc.value == 10000L)
      val stageLines = lines.asScala.toList
      assert(stageLines.exists(_.contains("tasks")), stageLines.take(3))
      assert(stageLines.exists(_.contains("remain")), "ETA must appear mid-stage")
    } finally handle.close()
  }

  test("per-stage ETA base: a later stage is not inflated by earlier stages") {
    import scala.jdk.CollectionConverters._
    // frozen injectable clock: all of job 2's task-ends observe zero
    // elapsed, so its ETAs must be 00:00:00 — under a shared logger the
    // 10 simulated hours between the jobs would bleed into job 2's base
    @volatile var now = 5_000_000L
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val handle = Progress.attachStageProgress(spark, timeDistanceMs = 0,
      clock = () => now, out = l => lines.add(l))
    def awaitDone(): Unit = {
      val deadline = System.currentTimeMillis() + 10000
      while (System.currentTimeMillis() < deadline &&
        !lines.asScala.exists(_.contains("4/4 tasks"))) Thread.sleep(50)
    }
    try {
      spark.range(0, 1000, 1, 4).count()
      awaitDone()
      lines.clear()
      now += 36_000_000L // ten idle hours between the jobs
      spark.range(0, 1000, 1, 4).count()
      awaitDone()
      val remains = lines.asScala.filter(_.contains("remain")).toList
      assert(remains.nonEmpty, "job 2 must log ETAs")
      assert(remains.forall(_.endsWith("remain 00:00:00")), remains)
    } finally handle.close()
  }
}
