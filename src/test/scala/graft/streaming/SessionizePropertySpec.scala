package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import StreamingOps.{Event, Session}

/** Randomized parity pinning for the r14 sessionize rewrite: for SEEDED
  * random event sets fed in random batch partitions and random
  * within-batch order — heavy cross-batch disorder, duplicate
  * timestamps, multiple users — the watermark-gated streaming
  * sessionizer must equal an independent in-memory reference of the
  * batch gap rule (global per-user sort, gap split, min/max/count)
  * once a far-future sentinel flushes everything. The hand-written
  * StreamingOpsSpec cases pin specific behaviors; this sweeps the
  * merge/fold logic across shapes nobody thought to write down.
  */
class SessionizePropertySpec extends SparkSpec {

  /** Independent reference: global sort per user, gap split. */
  private def referenceSessions(
      events: Seq[(Long, Long)], gapMs: Long): Set[Session] =
    events.groupBy(_._1).flatMap { case (user, evs) =>
      val ts = evs.map(_._2).sorted
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Vector[Long]]
      var cur = Vector(ts.head)
      ts.tail.foreach { t =>
        if (t - cur.last <= gapMs) cur :+= t
        else { sessions += cur; cur = Vector(t) }
      }
      sessions += cur
      sessions.map(s => Session(user, s.head, s.last, s.size))
    }.toSet

  test("random feeds, random batching: streaming == the batch gap rule after sentinel flush") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 5000L
    val rnd = new scala.util.Random(20260814L)
    (1 to 6).foreach { scenario =>
      val nUsers = 1 + rnd.nextInt(4)
      val nEvents = 20 + rnd.nextInt(60)
      // timestamps cluster at gap scale so runs produce real splits,
      // merges, and duplicate instants
      val events = Seq.fill(nEvents)(
        (rnd.nextInt(nUsers).toLong + 1L,
          (rnd.nextInt(40) * 2000 + rnd.nextInt(3) * 1000).toLong))
      val want = referenceSessions(events, gapMs)

      val shuffled = rnd.shuffle(events)
      val nBatches = 1 + rnd.nextInt(4)
      val batchSize = math.max(shuffled.size / nBatches, 1)
      val sentinelTs = events.map(_._2).max + 3650L * 24 * 3600 * 1000 +
        gapMs + 60000
      val input = MemoryStream[Event]
      val q = StreamingOps.sessionize(input.toDS(), gapMs,
          watermarkDelay = "3650 days")
        .writeStream.format("memory").queryName(s"prop_sessions_$scenario")
        .outputMode(OutputMode.Append()).start()
      try {
        shuffled.grouped(batchSize).foreach { b =>
          input.addData(b.map { case (u, t) => Event(u, new Timestamp(t), "e") })
          q.processAllAvailable()
        }
        input.addData(Event(999999999L, new Timestamp(sentinelTs), "wm"))
        q.processAllAvailable()
        val deadline = System.currentTimeMillis() + 30000
        var got = Set.empty[Session]
        while (got != want && System.currentTimeMillis() < deadline) {
          got = spark.table(s"prop_sessions_$scenario")
            .as[Session].collect().toSet
          if (got != want) Thread.sleep(100)
        }
        assert(got === want,
          s"scenario $scenario (seed-fixed, $nUsers users, $nEvents events, " +
            s"$nBatches batches): streaming ${got.size} != reference ${want.size}\n" +
            s"missing: ${(want -- got).take(5)}\nextra: ${(got -- want).take(5)}")
      } finally q.stop()
    }
  }
}
