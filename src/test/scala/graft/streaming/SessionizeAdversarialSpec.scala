package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import StreamingOps.{Event, Session}

/** r15 (verdict ask #7): CRAFTED adversarial batch splits for the
  * carried-session interval-merge — the shapes the randomized
  * SessionizePropertySpec is unlikely to hit by chance:
  *
  *  - a contiguous chain delivered in strictly REVERSE batch order
  *    (every batch merges in FRONT of the carried session);
  *  - a bridge event whose arrival must fuse TWO carried sessions into
  *    one (the fold's `acc.init :+ merged` chain-collapse path, twice
  *    in one fold);
  *  - events exactly `gapMs` apart split across batches (the boundary is
  *    INSIDE the session by the `<=` rule — off-by-one here would split);
  *  - the same timestamp appearing in different batches (n must count
  *    every event, merges must not drop the duplicate's count).
  *
  * All feeds use an admissible-forever watermark delay and a far-future
  * sentinel flush, so every case isolates the MERGE logic, not admission.
  */
class SessionizeAdversarialSpec extends SparkSpec {

  private var qn = 0

  /** Run the feed batches in order, flush with a sentinel, return the
    * emitted sessions for the real users.
    */
  private def run(batches: Seq[Seq[(Long, Long)]], gapMs: Long): Set[Session] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    qn += 1
    val name = s"adv_sessions_$qn"
    val allTs = batches.flatten.map(_._2)
    val sentinelTs = allTs.max + 3650L * 24 * 3600 * 1000 + gapMs + 60000
    val input = MemoryStream[Event]
    val q = StreamingOps.sessionize(input.toDS(), gapMs,
        watermarkDelay = "3650 days")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      batches.foreach { b =>
        input.addData(b.map { case (u, t) => Event(u, new Timestamp(t), "e") })
        q.processAllAvailable()
      }
      input.addData(Event(999999999L, new Timestamp(sentinelTs), "wm"))
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 30000
      def read() = spark.table(name).as[Session].collect()
        .filter(_.userId != 999999999L).toSet
      var got = read()
      while (got.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(100); got = read()
      }
      got
    } finally q.stop()
  }

  private val gap = 1000L

  test("contiguous chain in strictly reverse batch order = one session") {
    // 20 events 500ms apart, delivered one per batch from the LAST
    // backwards: every batch's singleton must merge in front of the
    // carried session (start = min), never form its own
    val ts = (0 until 20).map(i => 10000L + i * 500L)
    val batches = ts.reverse.map(t => Seq((1L, t)))
    assert(run(batches, gap) ===
      Set(Session(1L, ts.head, ts.last, 20)))
  }

  test("bridge event fuses two carried sessions; counts sum exactly") {
    // batch 1: [0..2] and [5000..5002] — two carried sessions (gap 1000,
    // distance 2998 > gap); batch 2: the bridge at 4000 (within gap of
    // neither... then 3000): craft so ONE event connects both: sessions
    // end 2000 and start 4000, bridge at 3000 is within gap of both
    val s1 = Seq((7L, 1000L), (7L, 1500L), (7L, 2000L))
    val s2 = Seq((7L, 4000L), (7L, 4500L), (7L, 5000L))
    val bridge = Seq((7L, 3000L))
    assert(run(Seq(s1 ++ s2, bridge), gap) ===
      Set(Session(7L, 1000L, 5000L, 7)))
    // same feed WITHOUT the bridge stays two sessions (the fuse above is
    // the bridge's doing, not an over-eager merge)
    assert(run(Seq(s1 ++ s2), gap) ===
      Set(Session(7L, 1000L, 2000L, 3), Session(7L, 4000L, 5000L, 3)))
  }

  test("chain of three carried sessions collapsed by bridges in one batch") {
    // base offset keeps ts off the initial watermark (an event at
    // absolute ts=0 sits ON watermark 0 and is dropped by the engine —
    // a harness artifact, not merge logic)
    val b0 = 1000000L
    val a = Seq((9L, b0 + 0L), (9L, b0 + 100L))
    val b = Seq((9L, b0 + 3000L), (9L, b0 + 3100L))
    val c = Seq((9L, b0 + 6000L), (9L, b0 + 6100L))
    // bridge chain: every hop <= gap both batch-locally and against the
    // carried extents (1000-100, 3000-2000, 4000-3100, 6000-5000), so
    // the merge fold must collapse all three carried sessions plus both
    // bridge sessions into ONE — exercising the acc.init chain repeatedly
    val bridges = Seq((9L, b0 + 1000L), (9L, b0 + 2000L),
      (9L, b0 + 4000L), (9L, b0 + 5000L))
    assert(run(Seq(a ++ b ++ c, bridges), gap) ===
      Set(Session(9L, b0, b0 + 6100L, 10)))
  }

  test("events exactly gapMs apart across batches stay one session") {
    // <= rule: t - lastTs == gapMs is INSIDE; deliver alternate halves in
    // separate batches so the boundary is evaluated in the carried merge
    val ts = (0 until 10).map(i => 50000L + i * gap)
    val (even, odd) = ts.zipWithIndex.partition(_._2 % 2 == 0)
    val batches = Seq(even.map(t => (3L, t._1)), odd.map(t => (3L, t._1)))
    assert(run(batches, gap) ===
      Set(Session(3L, ts.head, ts.last, 10)))
    // and gapMs + 1 apart splits into singletons (delivered interleaved)
    val ts2 = (0 until 6).map(i => 90000L + i * (gap + 1))
    val (e2, o2) = ts2.zipWithIndex.partition(_._2 % 2 == 0)
    assert(run(Seq(e2.map(t => (4L, t._1)), o2.map(t => (4L, t._1))), gap) ===
      ts2.map(t => Session(4L, t, t, 1)).toSet)
  }

  test("duplicate timestamps across batches all count") {
    val batches = Seq(
      Seq((5L, 1000L), (5L, 1000L), (5L, 1400L)),
      Seq((5L, 1000L), (5L, 1400L), (5L, 1800L)))
    assert(run(batches, gap) === Set(Session(5L, 1000L, 1800L, 6)))
  }
}
