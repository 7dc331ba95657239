package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import StreamingOps.{Event, ShingledDoc}

/** r15 (verdict ask #6): name where the stateful twins' time goes. The
  * engine already measures exactly the split the verdict asks for —
  * `StreamingQueryProgress.stateOperators` carries per-batch
  * allUpdatesTimeMs (state store read+write for arriving keys),
  * allRemovalsTimeMs (the timeout sweep), commitTimeMs (store commit),
  * and numRowsTotal (live state), while durationMs.addBatch is the whole
  * micro-batch. This probe feeds the throughput-benchmark shapes
  * (200k events / 20 batches sessionize; 20k docs / 20 batches minhash)
  * and prints the decomposition, plus a second sessionize pass at 4×
  * fewer batches to quantify the trigger-interval lever (state cost is
  * per-BATCH, so batch count divides it).
  */
object StreamingStateProfileProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def report(name: String, q: org.apache.spark.sql.streaming.StreamingQuery,
        rows: Long, wallSec: Double): Unit = {
      val progs = q.recentProgress.filter(_.numInputRows > 0)
      def sumState(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long) =
        progs.flatMap(_.stateOperators.map(f)).sum
      val addBatch = progs.flatMap(p =>
        Option(p.durationMs.get("addBatch")).map(_.toLong)).sum
      val upd = sumState(_.allUpdatesTimeMs)
      val rem = sumState(_.allRemovalsTimeMs)
      val com = sumState(_.commitTimeMs)
      val maxState = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
        .foldLeft(0L)(math.max)
      println(f"$name%-28s batches=${progs.length}%3d rows=$rows%7d " +
        f"wall=$wallSec%6.2fs thru=${rows / wallSec}%9.0f/s | " +
        f"addBatch=${addBatch / 1e3}%6.2fs state[upd=${upd / 1e3}%5.2fs " +
        f"rem=${rem / 1e3}%5.2fs commit=${com / 1e3}%5.2fs] " +
        f"other=${(wallSec * 1e3 - addBatch) / 1e3}%6.2fs maxStateRows=$maxState%6d")
    }

    // --- sessionize at the committed benchmark shape, two batch sizes ---
    for ((nBatches, tag) <- Seq((20, "20 batches"), (5, "5 batches"))) {
      val nEvents = 200000
      val nUsers = 5000
      val rnd = new scala.util.Random(7)
      val events = (0 until nEvents).map { i =>
        Event(rnd.nextInt(nUsers).toLong,
          new Timestamp(1000000L + i.toLong * 7 + rnd.nextInt(2000)), "e")
      }
      val input = MemoryStream[Event]
      val q = StreamingOps.sessionize(input.toDS(), gapMs = 5000,
          watermarkDelay = "10 seconds")
        .writeStream.format("noop").outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      events.grouped(nEvents / nBatches).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report(s"sessionize/$tag", q, nEvents, wall)
      q.stop()
    }

    // --- minhash near-dup twin at its benchmark shape ---
    {
      val nDocs = 20000
      val rnd = new scala.util.Random(9)
      val vocab = Vector.tabulate(500)(i => s"w$i")
      val docs = (0 until nDocs).map { i =>
        val sh = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).distinct
        ShingledDoc(i.toLong, sh, 1000000L + i * 5)
      }
      val input = MemoryStream[ShingledDoc]
      val q = StreamingOps.streamingMinhashPairs(input.toDS(), 0.5,
          watermarkDelay = Some("10 seconds"), retentionMs = 60000)
        .writeStream.format("noop").outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      docs.grouped(nDocs / 20).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      val wall = (System.nanoTime() - t0) / 1e9
      report("minhashPairs/20 batches", q, nDocs, wall)
      q.stop()
    }
    spark.stop()
  }
}
