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

    // rows accumulate into the committed STREAMING.json artifact (r15
    // verdict ask #7): the decomposition table plus the stateless ceiling,
    // so a regression in either is a visible artifact diff, not a lost
    // probe printout
    val artifact = scala.collection.mutable.LinkedHashMap.empty[String, String]

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
      // state[...] sums across parallel state-store partitions, so the
      // components can exceed wall; ratios, not absolute seconds, are the
      // signal
      artifact(name) =
        f"""{"batches":${progs.length},"rows":$rows,"wall_sec":$wallSec%.2f,""" +
          f""""rate_per_sec":${(rows / wallSec).toLong},"addbatch_sec":${addBatch / 1e3}%.2f,""" +
          f""""state_upd_sec":${upd / 1e3}%.2f,"state_rem_sec":${rem / 1e3}%.2f,""" +
          f""""state_commit_sec":${com / 1e3}%.2f,"max_state_rows":$maxState}"""
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

    // --- minhash near-dup twin at its benchmark shape -------------------
    // Three arms (r17 verdict ask #4): the 20-batch baseline on the
    // default (HDFS-backed) state store, a RocksDB provider A/B at the
    // same shape, and the 5-batch trigger-interval point — after the r17
    // state compaction (60-bit shingle hashes in state, not strings) the
    // residual per-batch cost is per-KEY state-store overhead × the
    // bands(16) cells each doc touches, so it divides by batch count
    // exactly like sessionize's.
    for ((nBatches, provider, tag) <- Seq(
        (20, None, "20 batches"),
        (20, Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
          "20 batches/rocksdb"),
        (5, None, "5 batches"))) {
      val nDocs = 20000
      val rnd = new scala.util.Random(9)
      val vocab = Vector.tabulate(500)(i => s"w$i")
      val docs = (0 until nDocs).map { i =>
        val sh = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).distinct
        ShingledDoc(i.toLong, sh, 1000000L + i * 5)
      }
      val default = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      provider.foreach(p =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      try {
        val input = MemoryStream[ShingledDoc]
        val q = StreamingOps.streamingMinhashPairs(input.toDS(), 0.5,
            watermarkDelay = Some("10 seconds"), retentionMs = 60000)
          .writeStream.format("noop").outputMode(OutputMode.Append()).start()
        val t0 = System.nanoTime()
        docs.grouped(nDocs / nBatches).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        report(s"minhashPairs/$tag", q, nDocs, wall)
        q.stop()
      } finally {
        provider.foreach { _ =>
          default match {
            case Some(v) => spark.conf.set(
              "spark.sql.streaming.stateStore.providerClass", v)
            case None => spark.conf.unset(
              "spark.sql.streaming.stateStore.providerClass")
          }
        }
      }
    }

    // --- the STATELESS ceiling at the same micro-batch shape ------------
    // strip_boilerplate is the projection-path twin (chunk hashing +
    // membership rewrite, no state store); its rate bounds what any
    // stateful twin could reach if state cost went to zero.
    val statelessRate: Double = {
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
      docs.grouped(n / 10).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"stateless ceiling (strip_boilerplate) rate=${n / sec}%.0f docs/s")
      artifact("stateless_strip_boilerplate") =
        f"""{"batches":10,"rows":$n,"wall_sec":$sec%.2f,"rate_per_sec":${(n / sec).toLong}}"""
      n / sec
    }

    // Tripwires — structural (machine-speed-free) dominance, plus a
    // generous absolute floor under the 22.6k docs/s committed in r15: a
    // config or code change that drags the stateless projection path
    // under 8k docs/s (or under the stateful sessionize rate) is a
    // defect, not noise.
    val sessRate = {
      val row = artifact("sessionize/20 batches")
      "\"rate_per_sec\":(\\d+)".r.findFirstMatchIn(row).get.group(1).toDouble
    }
    require(statelessRate >= 8000,
      f"stateless ceiling collapsed: $statelessRate%.0f docs/s < 8000 floor")
    require(statelessRate > sessRate,
      f"stateless ceiling ($statelessRate%.0f/s) must dominate stateful " +
        f"sessionize ($sessRate%.0f/s) — state cost cannot be negative")

    val json = artifact.map { case (k, v) => s""""$k": $v""" }
      .mkString("{\n  ", ",\n  ", ",\n  ")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("STREAMING.json"),
      json + s""""note": "state[upd/rem/commit] sum across state-store partitions and can exceed wall; ratios are the signal. Written by StreamingStateProfileProbe; tripwires: stateless >= 8k docs/s and stateless > stateful sessionize. r17 decomposition: after the minhash state compaction (60-bit hashes, not shingle strings) the residual cost is per-KEY state-store overhead x bands(16) cells/doc - value bytes no longer matter at this cell-size distribution, so docs/s scales with batch size (the 5-batch arm) and RocksDB LOSES at this state size (its per-batch checkpoint dominates - see the rocksdb arm's commit column)."\n}\n""")
    println("STREAMING.json written")
    spark.stop()
  }
}
