package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import StreamingOps.{Event, Session}

/** Streaming operators driven through MemoryStream micro-batches:
  * watermarked windowed counts and stateful sessionization.
  */
class StreamingOpsSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000)

  /** Poll `probe` until `ok` or timeout: event-time timeout flushes land
    * in a watermark-triggered NO-DATA batch that `processAllAvailable`
    * (which only awaits source offsets) may not wait for.
    */
  private def awaitResult[A](probe: => A)(ok: A => Boolean,
      timeoutMs: Long = 30000): A = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last = probe
    while (!ok(last) && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      last = probe
    }
    last
  }

  test("windowedCounts aggregates tumbling event-time windows under watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = StreamingOps.windowedCounts(
      input.toDF().toDF("ts", "kind"), "ts", "kind", "10 seconds", "5 seconds")

    val q = counts.writeStream
      .format("memory").queryName("win_counts").outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData((ts(1), "click"), (ts(3), "click"), (ts(7), "view"))
      q.processAllAvailable()
      input.addData((ts(12), "click"), (ts(14), "click"))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("window_start", "kind", "cnt")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(rows === Set(
        (ts(0), "click", 2L), (ts(0), "view", 1L), (ts(10), "click", 2L)))
    } finally q.stop()
  }

  test("sessionize: gap closes sessions, churned users flush by event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = StreamingOps.sessionize(input.toDS(), gapMs = 5000)

    val q = sessions.writeStream
      .format("memory").queryName("sessions").outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 1 events 1s,3s; user 2 event 2s — watermark only
      // reaches 3s, so nothing is ripe yet
      input.addData(Event(1, ts(1), "a"), Event(1, ts(3), "b"), Event(2, ts(2), "a"))
      q.processAllAvailable()
      assert(spark.table("sessions").isEmpty)
      // batch 2: user 1 at 20s advances the watermark past BOTH pending
      // gap deadlines — user 1's first session closes by the gap rule;
      // user 2 CHURNED (no further events, a different key) and flushes
      // by the event-time TIMEOUT. processAllAvailable terminating at all
      // is itself the r13 livelock regression check.
      input.addData(Event(1, ts(20), "c"))
      q.processAllAvailable()
      val want = Set(Session(1, 1000, 3000, 2), Session(2, 2000, 2000, 1))
      val got = awaitResult {
        spark.table("sessions").as[Session].collect().toSet
      }(_ == want)
      // user 1's OPEN session at 20s must not appear: the watermark (20s)
      // has not passed its deadline (25s)
      assert(got === want)
    } finally q.stop()
  }

  test("sessionize: out-of-order events extend within gap; far-late events form their own session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // generous watermark so cross-batch late events stay admissible
    val sessions = StreamingOps.sessionize(input.toDS(), gapMs = 5000,
      watermarkDelay = "1 minute")
    val q = sessions.writeStream
      .format("memory").queryName("ooo_sessions").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(Event(1, ts(10), "a"), Event(1, ts(12), "b"))
      q.processAllAvailable()
      // 8s is LATE but within gap of the carried session's START → extends
      // (start=min); 40s opens a second session
      input.addData(Event(1, ts(8), "late"), Event(1, ts(40), "c"))
      q.processAllAvailable()
      // 1s is farther than gap before every carried session → its OWN
      // session (the r13 ADVICE fix: must not rewind 8..12 to 1..12);
      // 300s pushes the watermark (300-60=240s) past every deadline
      input.addData(Event(1, ts(1), "verylate"), Event(1, ts(300), "d"))
      q.processAllAvailable()
      val want = Set(
        Session(1, 1000, 1000, 1),
        Session(1, 8000, 12000, 3),
        Session(1, 40000, 40000, 1))
      val got = awaitResult {
        spark.table("ooo_sessions").as[Session].collect().toSet
      }(_ == want)
      assert(got === want)
    } finally q.stop()
  }

  test("streamingDedup drops cross-batch duplicates within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamingOps.streamingDedup(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", Seq("doc_id"), "10 seconds")

    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((ts(1), 1L, "a"), (ts(2), 2L, "b"), (ts(3), 1L, "a-dup"))
      q.processAllAvailable()
      // duplicate of id 1 in a LATER micro-batch, still inside watermark
      input.addData((ts(4), 1L, "a-dup2"), (ts(5), 3L, "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id")
        .as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streamingPiiRedact: stateless ingest-time redaction equals the batch projection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (1L, "write to alice@example.com today"),
      (2L, "call 555-123-4567 and ping 10.0.0.1"),
      (3L, "plain words only"))
    val input = MemoryStream[(Long, String)]
    val redacted = StreamingOps.streamingPiiRedact(
      input.toDF().toDF("doc_id", "text"), "text")
    val q = redacted.writeStream
      .format("memory").queryName("pii_out").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("pii_out")
        .select("doc_id", "text", "n_redacted")
        .as[(Long, String, Int)].collect().sortBy(_._1)
      val want = StreamingOps.streamingPiiRedact(
        rows.toDF("doc_id", "text"), "text")
        .select("doc_id", "text", "n_redacted")
        .as[(Long, String, Int)].collect().sortBy(_._1)
      assert(got.toSeq === want.toSeq)
      assert(got.map(_._2).toSeq === Seq(
        "write to <EMAIL> today",
        "call <PHONE> and ping <IP>",
        "plain words only"))
      assert(got.map(_._3).toSeq === Seq(1, 2, 0))
    } finally q.stop()
  }

  test("streamingBpeEncode: frozen merges, stateless encode equals batch on real docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // merges train OFFLINE on the batch corpus; the stream encodes with
    // the frozen artifact — 2 micro-batches of real documents
    val docs = graft.Tables.documents(spark, sf0001)
    val trained = graft.text.Bpe.train(docs, "text", 24)
    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .orderBy("doc_id").limit(40).collect().toSeq
    val input = MemoryStream[(Long, String)]
    val encoded = StreamingOps.streamingBpeEncode(
      input.toDF().toDF("doc_id", "text"), "text", "toks", trained.merges)
    val q = encoded.writeStream
      .format("memory").queryName("bpe_out").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(rows.take(25): _*)
      q.processAllAvailable()
      input.addData(rows.drop(25): _*)
      q.processAllAvailable()
      val got = spark.table("bpe_out")
        .select("doc_id", "toks").as[(Long, Seq[String])]
        .collect().sortBy(_._1)
      val want = StreamingOps.streamingBpeEncode(
        rows.toDF("doc_id", "text"), "text", "toks", trained.merges)
        .select("doc_id", "toks").as[(Long, Seq[String])]
        .collect().sortBy(_._1)
      assert(got.toSeq === want.toSeq)
      assert(got.length == 40 && got.forall(_._2.nonEmpty))
    } finally q.stop()
  }

  test("streamingStripBoilerplate: frozen hot set, stateless strip equals BATCH stripBoilerplate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real docs + planted chrome so the drop path is guaranteed to fire:
    // three docs of one source share an 8-token header
    val header = "home about contact login search terms privacy cookie"
    val planted = Seq(
      (9001L, s"$header alpha beta gamma delta", "zsrc", "en", 1),
      (9002L, s"$header epsilon zeta eta theta", "zsrc", "en", 1),
      (9003L, s"$header iota kappa lambda mu", "zsrc", "en", 1))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
    val docs = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text", "source", "lang", "n_chars")
      .unionByName(planted)
    // artifact trained OFFLINE on the batch corpus
    val hot = graft.text.TextOps.boilerplateHotSet(docs)
    assert(hot.contains("zsrc"), "planted chrome must enter the hot set")
    val rows = docs.select("doc_id", "source", "text")
      .as[(Long, String, String)].orderBy("doc_id").collect().toSeq
    val input = MemoryStream[(Long, String, String)]
    val stripped = StreamingOps.streamingStripBoilerplate(
      input.toDF().toDF("doc_id", "source", "text"), hot)
    val q = stripped.writeStream
      .format("memory").queryName("bp_out").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(rows.take(300): _*)
      q.processAllAvailable()
      input.addData(rows.drop(300): _*)
      q.processAllAvailable()
      val got = spark.table("bp_out")
        .select("doc_id", "n_chunks", "n_dropped", "clean_text")
        .as[(Long, Int, Int, String)].collect().sortBy(_._1)
      // parity target is the BATCH operator — a different implementation
      // (aggregation-derived drop joins) over the same corpus + rule
      val want = graft.text.TextOps.stripBoilerplate(docs)
        .select("doc_id", "n_chunks", "n_dropped", "clean_text")
        .as[(Long, Int, Int, String)].collect().sortBy(_._1)
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) => assert(g == w, s"diverged: $g vs $w") }
      assert(got.count(_._3 > 0) >= 3, "the planted chrome must be stripped")
    } finally q.stop()
  }

  test("streamingQualityScore: frozen weights, stateless scoring equals batch on real docs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf0001)
    val w = graft.text.QualityClassifier.train(docs, "text")
    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .orderBy("doc_id").limit(40).collect().toSeq
    val input = MemoryStream[(Long, String)]
    val scored = StreamingOps.streamingQualityScore(
      input.toDF().toDF("doc_id", "text"), "text", "logit", w)
    val q = scored.writeStream
      .format("memory").queryName("qc_out").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData(rows.take(25): _*)
      q.processAllAvailable()
      input.addData(rows.drop(25): _*)
      q.processAllAvailable()
      val got = spark.table("qc_out").select("doc_id", "logit")
        .as[(Long, Double)].collect().sortBy(_._1)
      val want = StreamingOps.streamingQualityScore(
        rows.toDF("doc_id", "text"), "text", "logit", w)
        .select("doc_id", "logit").as[(Long, Double)].collect().sortBy(_._1)
      // bit-exact: the projection is the same exact-IEEE tree both ways
      assert(got.toSeq === want.toSeq)
      assert(got.length == 40)
      assert(got.exists(_._2 >= 0) && got.exists(_._2 < 0),
        "degenerate feed: expected both classes among the scored docs")
    } finally q.stop()
  }

  test("streamingSimhashPairs equals the batch band join on real documents") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // signatures from the REAL documents table, streamed in 3 micro-batches
    val sigs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), graft.text.Dedup.simhash(col("text")).as("simhash"))
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(sigs.length >= 30)
    val batches = sigs.grouped(math.max(sigs.length / 3, 1)).toSeq

    val input = MemoryStream[StreamingOps.SigDoc]
    val pairs = StreamingOps.streamingSimhashPairs(
      input.toDS(), maxHamming = 3)
    val q = pairs.writeStream
      .format("memory").queryName("phash_out").outputMode(OutputMode.Append())
      .start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (id, sig) => StreamingOps.SigDoc(id, sig, 1000L * i) })
        q.processAllAvailable()
      }
      // at-least-once per colliding band -> distinct at the sink
      val got = spark.table("phash_out").select("d1", "d2", "hd")
        .distinct().as[(Long, Long, Int)].collect().toSet
      val want = graft.text.Dedup.simhashPairs(
          sigs.toSeq.toDF("doc_id", "simhash"), maxHamming = 3)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("streaming clip-signature near-dup equals batch videoNearDupPairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.Multimodal
    // the gate's three-frame video payloads over the REAL documents table
    // (the SAME builder the gate queries use, so this parity can't drift
    // onto a stale stream); clip signatures are plain 64-bit simhashes, so
    // the streaming band machinery needs NO video-specific code — the
    // batch/streaming seam is the (doc_id, signature) row, same as text
    val docs = graft.text.TextQueries.withVideoPayload432(
      graft.Tables.documents(spark, sf001))
    val sigs = docs.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
      .map { case (id, p) =>
        (id, Multimodal.clipSignature(
          Multimodal.decodeFrames(p).map(Multimodal.imageAHash)))
      }
    assert(sigs.length >= 30)
    val batches = sigs.grouped(math.max(sigs.length / 3, 1)).toSeq

    val input = MemoryStream[StreamingOps.SigDoc]
    val pairs = StreamingOps.streamingSimhashPairs(
      input.toDS(), maxHamming = 12, bands = 16, bits = 64)
    val q = pairs.writeStream
      .format("memory").queryName("clip_out").outputMode(OutputMode.Append())
      .start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (id, sig) => StreamingOps.SigDoc(id, sig, 1000L * i) })
        q.processAllAvailable()
      }
      val got = spark.table("clip_out").select("d1", "d2", "hd")
        .distinct().as[(Long, Long, Int)].collect().toSet
      val want = Multimodal.videoNearDupPairs(docs, "doc_id", "payload",
          maxHamming = 12, bands = 16)
        .as[(Long, Long, Int)].collect().toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("LENIENT streaming tier: corrupt payloads mid-stream survive and pin to batch lenient") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.Multimodal
    // the gate's three-frame video payloads (same builder as the gate
    // queries), with three corruptions planted DRIVER-side so batch and
    // stream see byte-identical inputs:
    //  - one payload truncated INSIDE frame 2 (frames 0,1 must survive —
    //    prefix semantics — and the clip still pairs by its 2-frame vote)
    //  - one with a garbled magic byte (zero frames, error row)
    //  - one emptied (zero frames, "no decodable frames")
    val base = graft.text.TextQueries.withVideoPayload432(
        graft.Tables.documents(spark, sf001))
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(base.length >= 30)
    val third = base.length / 3
    // corrupt three MIDDLE rows: they arrive in micro-batch 2 of 3, so a
    // strict decoder would fail the stream mid-flight, not at the edges
    val idxTrunc = third + 1
    val idxMagic = third + 2
    val idxEmpty = third + 3
    val corrupted = base.zipWithIndex.map {
      case ((id, p), i) if i == idxTrunc => (id, p.take(11 + 192 + 11 + 192 + 20))
      case ((id, p), i) if i == idxMagic =>
        val q = p.clone(); q(0) = 'X'.toByte; (id, q)
      case ((id, _), i) if i == idxEmpty => (id, Array.empty[Byte])
      case ((id, p), _) => (id, p)
    }
    val corruptedDf = corrupted.toSeq.toDF("doc_id", "payload")

    val input = MemoryStream[StreamingOps.PayloadDoc]
    // two queries over the same stream: the signature audit sink and the
    // near-dup pair sink (each consumes the MemoryStream independently)
    val sigQ = StreamingOps.streamingClipSignaturesLenient(input.toDS())
      .writeStream.format("memory").queryName("lenient_sigs")
      .outputMode(OutputMode.Append()).start()
    val pairQ = StreamingOps.streamingVideoNearDupPairsLenient(
        input.toDS(), maxHamming = 12, bands = 16)
      .writeStream.format("memory").queryName("lenient_pairs")
      .outputMode(OutputMode.Append()).start()
    try {
      corrupted.grouped(math.max(third, 1)).zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (id, p) => StreamingOps.PayloadDoc(id, p, 1000L * i) })
        sigQ.processAllAvailable()
        pairQ.processAllAvailable()
      }
      // the stream SURVIVED the corrupt micro-batch (strict decode would
      // have thrown inside batch 2 and wedged both queries) — and the
      // signature rows equal the batch lenient tier exactly
      val gotSigs = spark.table("lenient_sigs")
        .select("docId", "sig", "nFrames", "decodeError")
        .as[(Long, Option[Long], Int, Option[String])].collect().toSet
      val wantSigs = Multimodal.clipSignaturesLenient(corruptedDf, "doc_id", "payload")
        .as[(Long, Option[Long], Int, Option[String])].collect().toSet
      assert(gotSigs === wantSigs)
      // the planted corruptions produced exactly the expected shapes
      val byId = gotSigs.map(s => s._1 -> s).toMap
      val trunc = byId(corrupted(idxTrunc)._1)
      assert(trunc._2.isDefined && trunc._3 === 2 && trunc._4.isDefined,
        s"truncated clip must keep its 2-frame prefix signature: $trunc")
      assert(byId(corrupted(idxMagic)._1)._2.isEmpty)
      assert(byId(corrupted(idxEmpty)._1)._4 === Some("no decodable frames"))
      assert(gotSigs.count(_._4.isEmpty) === base.length - 3)
      // pair parity vs the batch lenient near-dup on the same corrupted
      // corpus (at-least-once per colliding band -> distinct at the sink)
      val gotPairs = spark.table("lenient_pairs").select("d1", "d2", "hd")
        .distinct().as[(Long, Long, Int)].collect().toSet
      val wantPairs = Multimodal.videoNearDupPairsLenient(
          corruptedDf, "doc_id", "payload", maxHamming = 12, bands = 16)
        .as[(Long, Long, Int)].collect().toSet
      assert(gotPairs === wantPairs)
      assert(wantPairs.nonEmpty)
    } finally { sigQ.stop(); pairQ.stop() }
  }

  test("LENIENT image/audio streaming signatures survive corruption and match batch decode") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.Multimodal
    // image payloads from the gate's PPM builder shape: header + the
    // 192-char ASCII prefix as raster (same construction as mm_image_decode)
    val hdr = "P6\n8 8\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val imgs = graft.Tables.documents(spark, sf001)
      .where(length(col("text")) >= 192)
      .select(col("doc_id"), substring(col("text"), 1, 192).cast("binary").as("raster"))
      .as[(Long, Array[Byte])].collect().sortBy(_._1).take(30)
      .map { case (id, raster) => (id, hdr ++ raster) }
    val corrupted = imgs.zipWithIndex.map {
      case ((id, p), 10) => (id, p.take(60))                  // truncated raster
      case ((id, p), 11) => val q = p.clone(); q(0) = 'Z'.toByte; (id, q)
      case ((id, _), 12) => (id, null: Array[Byte])           // null payload
      case ((id, p), _) => (id, p)
    }
    val input = MemoryStream[StreamingOps.PayloadDoc]
    val q = StreamingOps.streamingImageSignaturesLenient(input.toDS())
      .writeStream.format("memory").queryName("img_lenient")
      .outputMode(OutputMode.Append()).start()
    try {
      corrupted.grouped(10).zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (id, p) => StreamingOps.PayloadDoc(id, p, 1000L * i) })
        q.processAllAvailable()
      }
      val got = spark.table("img_lenient")
        .select("docId", "sig", "decodeError")
        .as[(Long, Option[Long], Option[String])].collect().toSet
      // pinned against the BATCH lenient image decoder on the same bytes
      val want = Multimodal.decodeImageFeaturesLenient(
          corrupted.toSeq.toDF("doc_id", "payload"), "doc_id", "payload")
        .select(col("asset_id"), col("phash"), col("decode_error"))
        .as[(Long, Option[Long], Option[String])].collect().toSet
      assert(got === want)
      assert(got.count(_._3.isDefined) === 3 && got.count(_._2.isDefined) === 27)
      assert(got.exists(s => s._1 == corrupted(12)._1 && s._3 === Some("null payload")))
    } finally q.stop()

    // audio: canonical WAV header + doubled-PCM bytes (the gate's shape);
    // one truncated data chunk mid-stream
    val wavHdr = {
      val bb = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + 256).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8)
      bb.put("data".getBytes).putInt(256)
      bb.array()
    }
    val wavs = graft.Tables.documents(spark, sf001)
      .where(length(col("text")) >= 256)
      .select(col("doc_id"), substring(col("text"), 1, 256).as("s"))
      .as[(Long, String)].collect().sortBy(_._1).take(20)
      .map { case (id, s) => (id, wavHdr ++ s.map(c => ((c * 2) % 256).toByte).toArray) }
    val wavCorrupt = wavs.zipWithIndex.map {
      case ((id, p), 7) => (id, p.take(100)) // data chunk overruns the file
      case ((id, p), _) => (id, p)
    }
    val input2 = MemoryStream[StreamingOps.PayloadDoc]
    val q2 = StreamingOps.streamingAudioSignaturesLenient(input2.toDS())
      .writeStream.format("memory").queryName("wav_lenient")
      .outputMode(OutputMode.Append()).start()
    try {
      wavCorrupt.grouped(7).zipWithIndex.foreach { case (b, i) =>
        input2.addData(b.map { case (id, p) => StreamingOps.PayloadDoc(id, p, 1000L * i) })
        q2.processAllAvailable()
      }
      val got2 = spark.table("wav_lenient")
        .select("docId", "sig", "decodeError")
        .as[(Long, Option[Long], Option[String])].collect().toSet
      // the signature is audioFingerprint (not a batch DF column) — pin
      // against the shared per-payload function + the batch lenient
      // decoder's ERROR surface
      val want2 = wavCorrupt.map { case (id, p) =>
        val (sig, err) = Multimodal.signatureLeniently(p)(b =>
          Multimodal.audioFingerprint(Multimodal.decodeWavPcm8(b)))
        (id, sig, err)
      }.toSet
      assert(got2 === want2)
      val wantErrs = Multimodal.decodeAudioFeaturesLenient(
          wavCorrupt.toSeq.toDF("doc_id", "payload"), "doc_id", "payload")
        .where(col("decode_error").isNotNull)
        .select(col("asset_id"), col("decode_error"))
        .as[(Long, String)].collect().toMap
      assert(got2.filter(_._3.isDefined).map(s => s._1 -> s._3.get).toMap === wantErrs)
      assert(wantErrs.size === 1 &&
        wantErrs.head._2.contains("overruns the file"))
    } finally q2.stop()
  }

  test("streamingCosinePairsIvf equals batch cosinePairsIvf on real embeddings") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // centroids train OFFLINE on the batch corpus (the frozen-artifact
    // deployment shape); the SAME matrix drives both sides so parity is
    // over the probe machinery, not training
    val emb = graft.Tables.embeddings(spark, sf001)
    val cents = graft.ann.Ann.trainIvfCentroids(emb, "vec_id", "embedding")
    val rows = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(rows.length >= 100)
    val batches = rows.grouped(math.max(rows.length / 3, 1)).toSeq

    val input = MemoryStream[StreamingOps.VecDoc]
    val pairs = StreamingOps.streamingCosinePairsIvf(
      input.toDS(), threshold = 0.4, cents, nProbe = 2)
    val q = pairs.writeStream
      .format("memory").queryName("cosivf_out").outputMode(OutputMode.Append())
      .start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (id, v) => StreamingOps.VecDoc(id, v, 1000L * i) })
        q.processAllAvailable()
      }
      // at-least-once per shared probed cell -> distinct at the sink
      val got = spark.table("cosivf_out").select("a", "b", "score")
        .distinct().as[(Long, Long, Double)].collect().toSet
      val want = graft.ann.Ann.cosinePairsIvfWithCentroids(
          emb, "vec_id", "embedding", 0.4, nProbe = 2, cents)
        .as[(Long, Long, Double)].collect().toSet
      assert(want.nonEmpty)
      assert(got === want)
    } finally q.stop()
  }

  test("streamingMinhashPairs equals batch dd_minhash_lsh on real documents") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // shingled docs from the REAL documents table, streamed in 3 micro-batches
    val shingled = graft.text.Dedup.shingleDocs(
      graft.Tables.documents(spark, sf001), "doc_id", "text")
    val rows = shingled.select(col("doc_id"), col("shingles"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(rows.length >= 30)
    val batches = rows.grouped(math.max(rows.length / 3, 1)).toSeq

    val input = MemoryStream[StreamingOps.ShingledDoc]
    val pairs = StreamingOps.streamingMinhashPairs(input.toDS(), threshold = 0.5)
    val q = pairs.writeStream
      .format("memory").queryName("minhash_out").outputMode(OutputMode.Append())
      .start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        // half the docs arrive with DUPLICATED shingles: the operator's
        // distinctness normalization must make them indistinguishable from
        // the clean feed (the batch twin dedups inside shingleUdf)
        input.addData(b.map { case (id, sh) =>
          val fed = if (id % 2 == 0) sh ++ sh.take(sh.size / 2) else sh
          StreamingOps.ShingledDoc(id, fed, 1000L * i)
        })
        q.processAllAvailable()
      }
      // at-least-once per colliding band -> distinct at the sink
      val got = spark.table("minhash_out").select("d1", "d2", "inter", "j")
        .distinct().as[(Long, Long, Long, Double)].collect().toSet
      val want = graft.text.Dedup.minhashLshPairs(shingled, 0.5)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(want.nonEmpty)
      assert(got === want)
    } finally q.stop()
  }

  test("restart recovery: streamingMinhashPairs resumes from its checkpoint mid-feed, equals batch") {
    // the r11 verdict ask: the lenient tier proves poison records can't
    // wedge a micro-batch; THIS proves the state store survives a restart.
    // The query is stopped (killed) halfway through the feed and a new
    // query resumes from the same checkpoint: cross-restart pairs — an
    // old-side doc that arrived BEFORE the kill matching a new-side doc
    // fed AFTER it — exist only if the per-cell member state (shingle
    // sets included) was recovered from the checkpoint, not rebuilt.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val shingled = graft.text.Dedup.shingleDocs(
      graft.Tables.documents(spark, sf001), "doc_id", "text")
    val rows = shingled.select(col("doc_id"), col("shingles"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    val batches = rows.grouped(math.max(rows.length / 4, 1)).toSeq
    assert(batches.length >= 4)
    // a PLANTED cross-restart witness: doc 1000000 duplicates the lowest
    // phase-1 doc's shingles but is fed only AFTER the restart, so its
    // pair with the phase-1 original is emittable only from RECOVERED
    // per-cell state (shingle sets included), never from phase-2 data alone
    val witness = (1000000L, rows.head._2)
    val feed: Seq[(Long, Seq[String])] = rows :+ witness
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-stream-out").toString

    // the memory sink cannot recover from a checkpoint — the parquet file
    // sink is the recovery-capable sink (exactly-once via _spark_metadata)
    val input = MemoryStream[StreamingOps.ShingledDoc]
    def startQuery() =
      StreamingOps.streamingMinhashPairs(input.toDS(), threshold = 0.5)
        .writeStream.format("parquet")
        .outputMode(OutputMode.Append())
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
    def sinkPairs(): Set[(Long, Long, Long, Double)] =
      spark.read.parquet(outDir).select("d1", "d2", "inter", "j")
        .distinct().as[(Long, Long, Long, Double)].collect().toSet

    // phase 1: feed the first half, then KILL the query
    val q1 = startQuery()
    try {
      batches.take(2).zipWithIndex.foreach { case (b, i) =>
        input.addData(b.map { case (id, sh) =>
          StreamingOps.ShingledDoc(id, sh, 1000L * i)
        })
        q1.processAllAvailable()
      }
    } finally q1.stop()
    val beforeKill = sinkPairs()

    // phase 2: the rest of the feed (witness last) arrives while the query
    // is DOWN; a fresh query on the same checkpoint must pick up exactly
    // there — with its state store restored
    (batches.drop(2).map(_.toSeq) :+ Seq(witness)).zipWithIndex.foreach { case (b, i) =>
      input.addData(b.map { case (id, sh) =>
        StreamingOps.ShingledDoc(id, sh, 1000L * (i + 2))
      })
    }
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = sinkPairs()

    val want = graft.text.Dedup.minhashLshPairs(
      feed.toDF("doc_id", "shingles"), 0.5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(want.nonEmpty)
    assert(got === want,
      s"stream across restart (${got.size} pairs, ${beforeKill.size} pre-kill) " +
        s"!= batch (${want.size})")
    // the witness pair (phase-1 doc × post-restart doc) is the recovery
    // proof: it requires the killed query's cell members in the restarted
    // query's state store
    val witnessPairs = got.filter(p => p._2 == witness._1 && p._1 <= rows.last._1)
    assert(witnessPairs.nonEmpty,
      "no cross-restart pair emitted — state was not recovered from the checkpoint")
  }

  test("embedding twin event-time retention: late arrivals dropped, idle cells expire") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two fixed direction clusters; the trained quantizer is irrelevant to
    // the retention mechanics, so a hand-built 2-cell centroid matrix
    // keeps the cells predictable
    val cents = Array(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0))
    def vecA(id: Long, ts: Long) =
      StreamingOps.VecDoc(id, Seq(1f, 0.01f, 0f, 0f), ts)
    // watermark pushers: all land in cell B (nProbe=1) but are mutually
    // ~orthogonal within it (pairwise cos <= 0.71 < 0.9), so they push
    // event time without pairing with each other
    def vecB(id: Long, ts: Long): StreamingOps.VecDoc = {
      val tail: Seq[Float] = (id % 3) match {
        case 0 => Seq(1f, 0f)
        case 1 => Seq(-1f, 0f)
        case _ => Seq(0f, 1f)
      }
      StreamingOps.VecDoc(id, Seq(0f, 1f) ++ tail, ts)
    }
    val input = MemoryStream[StreamingOps.VecDoc]
    val pairs = StreamingOps.streamingCosinePairsIvf(input.toDS(),
      threshold = 0.9, cents, nProbe = 1,
      retentionMs = 60000, watermarkDelay = Some("5 seconds"))
    val q = pairs.writeStream.format("memory").queryName("cosret_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = scala.collection.mutable.ArrayBuffer.empty[Long]
      def step(ds: StreamingOps.VecDoc*): Unit = {
        input.addData(ds: _*)
        q.processAllAvailable()
        rows += q.lastProgress.stateOperators.head.numRowsTotal
      }
      // b1: two A-direction vectors inside retention -> the expected pair
      step(vecA(1, 10000), vecA(2, 12000))
      // b2: far-future B-direction vector pushes the watermark past
      // 1/2 + retention (different cell, pairs with nothing)
      step(vecB(100, 1000000000L))
      // b3: vector 3 shares A's direction but watermark eviction cleared
      // 1/2 BEFORE pairing; vector 4 is LATE (behind watermark) -> dropped
      step(vecA(3, 999996000L), vecA(4, 5000))
      // b4/b5: watermark pushes expire the now-idle cells
      step(vecB(200, 2000000000L))
      step(vecB(201, 2100000000L))
      val got = spark.table("cosret_out").select("a", "b").distinct()
        .as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 2L)),
        s"expected only the in-retention pair, got $got")
      assert(rows.last < rows.max,
        s"idle cells must expire via event-time timeout: $rows")
    } finally q.stop()
  }

  test("event-time retention: late arrivals dropped, idle cells expire under watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def doc(id: Long, tag: String, ts: Long) =
      StreamingOps.ShingledDoc(id, (0 until 12).map(i => s"$tag$i"), ts)
    val input = MemoryStream[StreamingOps.ShingledDoc]
    val pairs = StreamingOps.streamingMinhashPairs(input.toDS(), threshold = 0.5,
      retentionMs = 60000, watermarkDelay = Some("5 seconds"))
    val q = pairs.writeStream.format("memory").queryName("evret_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val rows = scala.collection.mutable.ArrayBuffer.empty[Long]
      def step(ds: StreamingOps.ShingledDoc*): Unit = {
        input.addData(ds: _*)
        q.processAllAvailable()
        rows += q.lastProgress.stateOperators.head.numRowsTotal
      }
      // b1: A and near-dup B inside retention -> the one expected pair
      step(doc(1, "blk", 10000), doc(2, "blk", 12000))
      // b2: unrelated future doc advances the watermark past A/B + retention
      step(doc(100, "other", 1000000000L))
      // b3: doc 3 shares A's shingles but sits beyond retention — watermark
      // eviction clears A/B BEFORE pairing; doc 4 also shares them but is
      // LATE (behind the watermark) and must be dropped, not paired with 3
      step(doc(3, "blk", 999996000L), doc(4, "blk", 5000))
      // b4/b5: further watermark pushes expire the now-idle cells
      step(doc(200, "misc", 2000000000L))
      step(doc(201, "misc2", 2100000000L))
      val got = spark.table("evret_out").select("d1", "d2").distinct()
        .as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 2L)),
        s"expected only the in-retention pair, got $got")
      // bounded state: idle cells were REMOVED by the event-time timeout —
      // the final state footprint sits below the peak
      assert(rows.last < rows.max,
        s"idle cells must expire via event-time timeout: $rows")
    } finally q.stop()
  }

  test("windowedCounts over the real events parquet file-stream equals batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // file-source streaming needs a directory containing just this table
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf0001/events.parquet"),
      dir.resolve("events.parquet"))
    val schema = spark.read.parquet(s"$sf0001/events.parquet").schema
    // Tables.normalizeEventTs handles whichever physical ts layout the
    // driver wrote (nanos-long or timestamp[us]) — see Tables.events
    def prep(df: org.apache.spark.sql.DataFrame) =
      graft.Tables.normalizeEventTs(df)
        .withColumn("tsm", timestamp_micros(col("ts")))
    val streamed = StreamingOps.windowedCounts(
      prep(spark.readStream.schema(schema).parquet(dir.toString)),
      "tsm", "event_type", "1 day", "1 hour")
    val q = streamed.writeStream
      .format("memory").queryName("ev_win_stream").outputMode(OutputMode.Complete())
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("ev_win_stream")
        .as[(Timestamp, String, Long)].collect().toSet
      val want = StreamingOps.windowedCounts(
          prep(spark.read.parquet(s"$sf0001/events.parquet")),
          "tsm", "event_type", "1 day", "1 hour")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(got === want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionizer equals the batch gap rule on real events, disorder + timeout flushes included") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 6L * 3600 * 1000
    // real events at ms precision (the streaming Event granularity)
    val events = graft.Tables.events(spark, sf0001)
      .select($"user_id", $"ts".as("tsu"), $"event_type")
      .as[(Long, Long, String)].collect()
      .map { case (u, tsu, et) => Event(u, new Timestamp(tsu / 1000), et) }
    // the batch twin: ev_sessionize's exact window-function gap rule,
    // applied to the SAME ms values the stream sees
    val w = Window.partitionBy($"user_id").orderBy($"tms")
    val want = events.toSeq.map(e => (e.userId, e.ts.getTime))
      .toDF("user_id", "tms")
      .withColumn("prev", lag($"tms", 1).over(w))
      .withColumn("is_new",
        when($"prev".isNull || $"tms" - $"prev" > gapMs, 1L).otherwise(0L))
      .withColumn("sid", sum($"is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sid")
      .agg(min($"tms").as("startTs"), max($"tms").as("endTs"),
        count(lit(1)).cast("int").as("nEvents"))
      .select($"user_id".as("userId"), $"startTs", $"endTs", $"nEvents")
      .as[Session].collect().toSet

    // feed the stream in DETERMINISTICALLY SHUFFLED batches — cross-batch
    // disorder everywhere — under a watermark delay that keeps every
    // event admissible; a far-future sentinel (synthetic user) then
    // drives the watermark past every real session's gap deadline, so
    // ALL real sessions (each user's final one included) flush via the
    // event-time timeout. Equality with the batch twin is then EXACT.
    val delayMs = 3650L * 24 * 3600 * 1000
    val shuffled = new scala.util.Random(42).shuffle(events.toSeq)
    val sentinel = Event(999999999L,
      new Timestamp(events.map(_.ts.getTime).max + delayMs + gapMs + 10000), "wm")
    val input = MemoryStream[Event]
    val q = StreamingOps.sessionize(input.toDS(), gapMs,
        watermarkDelay = "3650 days")
      .writeStream.format("memory").queryName("ev_sessions_real")
      .outputMode(OutputMode.Append()).start()
    try {
      shuffled.grouped(math.max(shuffled.length / 3, 1)).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      input.addData(sentinel)
      q.processAllAvailable()
      val got = awaitResult {
        spark.table("ev_sessions_real").as[Session].collect().toSet
      }(_ == want, timeoutMs = 60000)
      assert(want.nonEmpty)
      assert(got === want,
        s"stream (${got.size} sessions) != batch gap rule (${want.size})")
    } finally q.stop()
  }

  test("restart recovery: a pre-kill open session closes post-restart with exact bounds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-sess-out").toString
    val input = MemoryStream[Event]
    def startQuery() =
      StreamingOps.sessionize(input.toDS(), gapMs = 5000)
        .writeStream.format("parquet")
        .outputMode(OutputMode.Append())
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .start()
    def sinkSessions(): Set[Session] = {
      val files = new java.io.File(outDir).listFiles()
      if (files == null || !files.exists(_.getName.endsWith(".parquet"))) Set.empty
      else spark.read.parquet(outDir).as[Session].collect().toSet
    }
    // phase 1: open a session (1s..3s), then KILL the query before any
    // watermark movement can close it
    val q1 = startQuery()
    try {
      input.addData(Event(1, ts(1), "a"), Event(1, ts(3), "b"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(sinkSessions().isEmpty)

    // phase 2: more data arrives while the query is DOWN; the restarted
    // query must recover the open session from the state store — the gap
    // rule closes it with EXACT pre-kill bounds — and the far-future
    // event pushes the watermark so the 20s session timeout-flushes too
    input.addData(Event(1, ts(20), "c"), Event(2, ts(10000), "wm"))
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val want = Set(Session(1, 1000, 3000, 2), Session(1, 20000, 20000, 1))
      val got = awaitResult { sinkSessions() }(_ == want)
      assert(got === want,
        "open session was not recovered from the checkpointed state store")
    } finally q2.stop()
  }

  test("currentOpenSessions batch helper computes final sessions") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(1), "a"), Event(1, ts(3), "b"), Event(1, ts(20), "c"),
      Event(2, ts(5), "a")).toDS()
    val open = StreamingOps.currentOpenSessions(events, gapMs = 5000)
      .collect().map(s => (s.userId, s.startTs, s.nEvents)).toSet
    assert(open === Set((1L, 20000L, 1), (2L, 5000L, 1)))
  }

  test("streamingAnnIngest: the maintained standing index is bit-identical to one batch build over the full corpus (replays are no-ops)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // centroids freeze at deployment (the offline-trained-artifact shape
    // shared with the streaming IVF twin); the corpus is the narrow
    // (vec_id, embedding) projection the index actually routes on
    val emb = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val cents = graft.ann.Ann.trainIvfCentroids(
      emb, "vec_id", "embedding", numCells = 8)
    val initial = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb.where(col("vec_id") < 300), "vec_id", "embedding", cents,
      m = 8, ef = 64, maxShardRows = 64)
    val rows = emb.where(col("vec_id") >= 300)
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(rows.length >= 100)
    val batches = rows.grouped(math.max(rows.length / 3, 1)).toSeq

    val input = MemoryStream[(Long, Seq[Float])]
    val (handle, writer) = StreamingOps.streamingAnnIngest(
      input.toDS().toDF("vec_id", "embedding"), initial)
    val q = writer.start()
    val fresh = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = 64)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // foreachBatch is at-least-once: a replayed batch must land as a
      // no-op (insertNew drops already-standing ids)
      input.addData(batches.last)
      q.processAllAvailable()
      assert(handle.current.shardFingerprints == fresh.shardFingerprints,
        "maintained graphs diverged from the batch build")
      val got = handle.current.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)
        .collect().map(_.toString).toSeq
      val want = fresh.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)
        .collect().map(_.toString).toSeq
      assert(got.nonEmpty && got == want)
      // streamed rows themselves serve as queries
      assert(handle.current.topK(col("vec_id") === 450, k = 3, nProbeCells = 4)
        .collect().map(_.toString).toSeq ==
        fresh.topK(col("vec_id") === 450, k = 3, nProbeCells = 4)
          .collect().map(_.toString).toSeq)
    } finally {
      q.stop(); fresh.release(); handle.current.release()
    }
  }

  test("streamingAnnIngest with snapshotDir: corpus lineage chains durable parquet, parity unchanged") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val cents = graft.ann.Ann.trainIvfCentroids(
      emb, "vec_id", "embedding", numCells = 4)
    val initial = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb.where(col("vec_id") < 300), "vec_id", "embedding", cents,
      m = 8, ef = 64, maxShardRows = 64)
    val rows = emb.where(col("vec_id") >= 300)
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    val batches = rows.grouped(math.max(rows.length / 2, 1)).toSeq
    val snapDir = java.nio.file.Files
      .createTempDirectory("ann-ingest-snap").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val (handle, writer) = StreamingOps.streamingAnnIngest(
      input.toDS().toDF("vec_id", "embedding"), initial,
      snapshotDir = Some(snapDir))
    val q = writer.start()
    val fresh = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = 64)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      // each accepted batch left a durable parquet snapshot — the corpus
      // lineage no longer references the epoch-scoped micro-batch frames
      val snaps = new java.io.File(snapDir).listFiles()
        .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
      assert(snaps.length == batches.length, s"snapshots: ${snaps.toSeq}")
      assert(handle.current.shardFingerprints == fresh.shardFingerprints)
      val got = handle.current.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)
        .collect().map(_.toString).toSeq
      val want = fresh.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)
        .collect().map(_.toString).toSeq
      assert(got.nonEmpty && got == want)
    } finally { q.stop(); fresh.release(); handle.current.release() }
  }

  test("streamingAnnMaintain: upserts + deletes + periodic compact under foreachBatch == the batch remove+compact path, replays are no-ops") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, not}
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val cents = graft.ann.Ann.trainIvfCentroids(
      emb, "vec_id", "embedding", numCells = 8)
    val initial = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb.where(col("vec_id") < 300), "vec_id", "embedding", cents,
      m = 8, ef = 64, maxShardRows = 64)
    val all = emb.as[(Long, Seq[Float])].collect().sortBy(_._1).toMap
    def ups(ids: Range): Seq[(Long, Seq[Float], String)] =
      ids.filter(i => all.contains(i.toLong))
        .map(i => (i.toLong, all(i.toLong), "upsert"))
    def dels(ids: Seq[Int]): Seq[(Long, Seq[Float], String)] =
      ids.map(i => (i.toLong, Seq.empty[Float], "delete"))
    val deletedIds = Set(5L, 310L) ++ (320 to 329).map(_.toLong)
    val snapDir = java.nio.file.Files
      .createTempDirectory("ann-maintain-snap").toString
    val input = MemoryStream[(Long, Seq[Float], String)]
    val (handle, writer) = StreamingOps.streamingAnnMaintain(
      input.toDS().toDF("vec_id", "embedding", "op"), initial,
      compactEvery = 2, snapshotDir = Some(snapDir))
    val q = writer.start()
    val survivors = emb.where(not(col("vec_id").isInCollection(deletedIds)))
    val fresh = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      survivors, "vec_id", "embedding", cents, m = 8, ef = 64,
      maxShardRows = 64)
    try {
      input.addData(ups(300 until 350)); q.processAllAvailable()
      input.addData(ups(350 until 400) ++ dels(Seq(5, 310)))
      q.processAllAvailable() // batch 2: compacts — 5 and 310 leave the graphs
      input.addData(dels(320 to 329))
      q.processAllAvailable() // batch 3: tombstoned, NOT yet compacted
      // tombstones govern serving immediately, pre-compact
      val mid = handle.current
        .topK(col("vec_id") < 330 && col("vec_id") >= 300, k = 3,
          nProbeCells = 8, maxQueries = 500)
        .select("query_id").distinct().collect().map(_.getLong(0)).toSet
      assert(mid.nonEmpty && (mid intersect deletedIds).isEmpty,
        s"tombstoned ids served as queries pre-compact: $mid")
      val lastBatch = ups(400 until all.size + 100)
      input.addData(lastBatch); q.processAllAvailable() // batch 4: compacts
      // at-least-once: replay the last (upsert-only) batch — a no-op
      input.addData(lastBatch); q.processAllAvailable()
      assert(handle.current.shardFingerprints == fresh.shardFingerprints,
        "maintained graphs diverged from the batch remove+compact twin")
      for (pred <- Seq(col("vec_id") < 20,
          col("vec_id") >= 300 && col("vec_id") < 320)) {
        val got = handle.current.topK(pred, k = 5, nProbeCells = 4)
          .collect().map(_.toString).toSeq
        val want = fresh.topK(pred, k = 5, nProbeCells = 4)
          .collect().map(_.toString).toSeq
        assert(got.nonEmpty && got == want, s"served rows diverged ($pred)")
      }
      // deleted ids neither ask nor answer, post-compact
      assert(handle.current.topK(col("vec_id").isInCollection(deletedIds),
        k = 3, nProbeCells = 8).isEmpty)
    } finally { q.stop(); fresh.release(); handle.current.release() }
  }

  test("streamingAnnMaintain contracts: bounded frame rejected, missing op column rejected, delete-id cap fails loud") {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val cents = graft.ann.Ann.trainIvfCentroids(
      emb, "vec_id", "embedding", numCells = 4)
    val idx = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = 64)
    try {
      val bounded = intercept[IllegalArgumentException] {
        StreamingOps.streamingAnnMaintain(
          emb.withColumn("op", org.apache.spark.sql.functions.lit("upsert")),
          idx)
      }
      assert(bounded.getMessage.contains("streaming"))
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Seq[Float])]
      val missingOp = intercept[IllegalArgumentException] {
        StreamingOps.streamingAnnMaintain(
          input.toDS().toDF("vec_id", "embedding"), idx)
      }
      assert(missingOp.getMessage.contains("op"))
      // the delete-id collect is bounded: a batch past the cap fails the
      // stream loudly instead of silently materializing the driver
      val in2 = MemoryStream[(Long, Seq[Float], String)]
      val (_, writer) = StreamingOps.streamingAnnMaintain(
        in2.toDS().toDF("vec_id", "embedding", "op"), idx,
        maxDeleteIds = 4)
      val q = writer.start()
      try {
        in2.addData((0 until 10).map(i => (i.toLong, Seq.empty[Float], "delete")))
        val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          q.processAllAvailable()
        }
        assert(e.getMessage.contains("maxDeleteIds") ||
          Option(e.getCause).exists(_.getMessage.contains("maxDeleteIds")))
      } finally q.stop()
    } finally idx.release()
  }

  test("streamingAnnIngest rejects a bounded frame") {
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val cents = graft.ann.Ann.trainIvfCentroids(
      emb, "vec_id", "embedding", numCells = 4)
    val idx = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = 64)
    try {
      val e = intercept[IllegalArgumentException] {
        StreamingOps.streamingAnnIngest(emb, idx)
      }
      assert(e.getMessage.contains("streaming"))
    } finally idx.release()
  }

  test("streamingAnnIngest checkpoint + resumeStandingAnnIndex: restart " +
      "recovers the index from the last committed checkpoint plus WAL " +
      "replay, bit-identically; stale checkpoints pruned; unmarked dirs " +
      "ignored") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val cents = graft.ann.Ann.trainIvfCentroids(
      emb, "vec_id", "embedding", numCells = 4)
    val initial = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb.where(col("vec_id") < 300), "vec_id", "embedding", cents,
      m = 8, ef = 64, maxShardRows = 64)
    val rows = emb.where(col("vec_id") >= 300)
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    // 5 batches, checkpointEvery = 2: checkpoints land at batches 1 and
    // 3 (the second prunes the first), batch 4 lives only in the WAL —
    // resume must load ckpt=3 and replay batch 4
    val batches = rows.grouped(math.max(rows.length / 5 + 1, 1)).toSeq
    assert(batches.length == 5)
    val snapDir = java.nio.file.Files
      .createTempDirectory("ann-ckpt-snap").toString
    val ckptDir = java.nio.file.Files
      .createTempDirectory("ann-ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val (handle, writer) = StreamingOps.streamingAnnIngest(
      input.toDS().toDF("vec_id", "embedding"), initial,
      snapshotDir = Some(snapDir), checkpointDir = Some(ckptDir),
      checkpointEvery = 2)
    val q = writer.start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    // only the newest committed checkpoint survives pruning
    val ckpts = new java.io.File(ckptDir).listFiles()
      .filter(_.getName.startsWith("ckpt=")).map(_.getName).toSeq
    assert(ckpts == Seq("ckpt=3"), s"checkpoints on disk: $ckpts")
    // an unmarked dir — a save that crashed before its commit marker —
    // must be invisible to resume
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(ckptDir, "ckpt=999"))
    val resumed = StreamingOps.resumeStandingAnnIndex(
      spark, ckptDir, snapDir)
    try {
      assert(resumed.shardFingerprints == handle.current.shardFingerprints,
        "resumed graphs diverged from the live index")
      val got = resumed.topK(col("vec_id") < 20, k = 5, nProbeCells = 4)
        .collect().map(_.toString).toSeq
      val want = handle.current
        .topK(col("vec_id") < 20, k = 5, nProbeCells = 4)
        .collect().map(_.toString).toSeq
      assert(got.nonEmpty && got == want, "resumed served rows diverged")
    } finally { resumed.release(); handle.current.release() }
    // contract: a checkpoint without the WAL would lose post-checkpoint
    // batches — rejected at wiring time, not discovered at resume
    val idx2 = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = 64)
    try {
      val e = intercept[IllegalArgumentException] {
        StreamingOps.streamingAnnIngest(
          input.toDS().toDF("vec_id", "embedding"), idx2,
          checkpointDir = Some(ckptDir))
      }
      assert(e.getMessage.contains("snapshotDir"))
    } finally idx2.release()
  }

  test("streamingAnnMaintain checkpoint + resumeStandingAnnIndex: " +
      "upserts AND deletes past the checkpoint replay from the WAL " +
      "(delete sidecars), landing bit-identical to the live index and " +
      "the batch remove+compact reference") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, not}
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, sf001)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val cents = graft.ann.Ann.trainIvfCentroids(
      emb, "vec_id", "embedding", numCells = 8)
    val initial = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb.where(col("vec_id") < 300), "vec_id", "embedding", cents,
      m = 8, ef = 64, maxShardRows = 64)
    val all = emb.as[(Long, Seq[Float])].collect().sortBy(_._1).toMap
    def ups(ids: Range): Seq[(Long, Seq[Float], String)] =
      ids.filter(i => all.contains(i.toLong))
        .map(i => (i.toLong, all(i.toLong), "upsert"))
    def dels(ids: Seq[Int]): Seq[(Long, Seq[Float], String)] =
      ids.map(i => (i.toLong, Seq.empty[Float], "delete"))
    val deletedIds = Set(5L, 310L) ++ (320 to 324).map(_.toLong)
    val snapDir = java.nio.file.Files
      .createTempDirectory("ann-mckpt-snap").toString
    val ckptDir = java.nio.file.Files
      .createTempDirectory("ann-mckpt").toString
    val input = MemoryStream[(Long, Seq[Float], String)]
    // compactEvery = 1 (the cadence where live and replay agree
    // bit-for-bit — see resumeStandingAnnIndex), checkpointEvery = 2:
    // the checkpoint lands at batch 1; batch 2's upserts AND deletes
    // live only in the WAL, so resume replays both arms
    val (handle, writer) = StreamingOps.streamingAnnMaintain(
      input.toDS().toDF("vec_id", "embedding", "op"), initial,
      compactEvery = 1, snapshotDir = Some(snapDir),
      checkpointDir = Some(ckptDir), checkpointEvery = 2)
    val q = writer.start()
    try {
      input.addData(ups(300 until 350)); q.processAllAvailable()
      input.addData(ups(350 until 400) ++ dels(Seq(5, 310)))
      q.processAllAvailable() // batch 1: checkpoint lands here
      input.addData(ups(400 until all.size + 100) ++ dels((320 to 324).toSeq))
      q.processAllAvailable() // batch 2: WAL-only (upserts + deletes)
    } finally q.stop()
    // the delete sidecars past the checkpoint are on disk
    val sidecars = new java.io.File(snapDir).listFiles()
      .filter(_.getName.startsWith("deletes_batch=")).map(_.getName).toSet
    assert(sidecars == Set("deletes_batch=1", "deletes_batch=2"),
      s"delete sidecars on disk: $sidecars")
    val resumed = StreamingOps.resumeStandingAnnIndex(
      spark, ckptDir, snapDir)
    val survivors = emb.where(not(col("vec_id").isInCollection(deletedIds)))
    val fresh = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      survivors, "vec_id", "embedding", cents, m = 8, ef = 64,
      maxShardRows = 64)
    try {
      assert(resumed.shardFingerprints == handle.current.shardFingerprints,
        "resumed graphs diverged from the live index")
      assert(resumed.shardFingerprints == fresh.shardFingerprints,
        "resumed graphs diverged from the batch remove+compact reference")
      for (pred <- Seq(col("vec_id") < 20,
          col("vec_id") >= 300 && col("vec_id") < 320)) {
        val got = resumed.topK(pred, k = 5, nProbeCells = 4)
          .collect().map(_.toString).toSeq
        val want = fresh.topK(pred, k = 5, nProbeCells = 4)
          .collect().map(_.toString).toSeq
        assert(got.nonEmpty && got == want, s"served rows diverged ($pred)")
      }
      // resumed index neither asks nor answers with deleted ids
      assert(resumed.topK(col("vec_id").isInCollection(deletedIds),
        k = 3, nProbeCells = 8).isEmpty)
    } finally { resumed.release(); fresh.release(); handle.current.release() }
  }

  test("streamingAnnMaintain checkpoint contracts: checkpointEvery must " +
      "align with compactEvery; resume with no committed checkpoint " +
      "fails loud") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val cents = graft.ann.Ann.trainIvfCentroids(
      emb, "vec_id", "embedding", numCells = 4)
    val idx = graft.ann.Ann.buildHnswRoutedIndexWithCentroids(
      emb, "vec_id", "embedding", cents, m = 8, ef = 64, maxShardRows = 64)
    try {
      val input = MemoryStream[(Long, Seq[Float], String)]
      // checkpointEvery = 3 with compactEvery = 2 could checkpoint an
      // index carrying tombstones — save() would fail mid-stream; reject
      // at wiring time instead
      val e = intercept[IllegalArgumentException] {
        StreamingOps.streamingAnnMaintain(
          input.toDS().toDF("vec_id", "embedding", "op"), idx,
          compactEvery = 2, snapshotDir = Some("/tmp/unused-snap"),
          checkpointDir = Some("/tmp/unused-ckpt"), checkpointEvery = 3)
      }
      assert(e.getMessage.contains("multiple"))
      val empty = java.nio.file.Files
        .createTempDirectory("ann-no-ckpt").toString
      val e2 = intercept[IllegalArgumentException] {
        StreamingOps.resumeStandingAnnIndex(spark, empty, empty)
      }
      assert(e2.getMessage.contains("no committed checkpoint"))
    } finally idx.release()
  }
}
