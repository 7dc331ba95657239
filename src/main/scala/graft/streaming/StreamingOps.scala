package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's operators (SURVEY §2.10: the
  * reference is batch-only — this is the engine's scale-out extension, not
  * parity): event-time windowed aggregation with watermarked late-data
  * handling, and gap-based sessionization via custom keyed state.
  *
  * Both run identically over `readStream` sources and over bounded batch
  * frames (the Dataset API is the same plan language) — tested with
  * `MemoryStream` feeding micro-batches.
  */
object StreamingOps {

  /** `a + b` clamped at Long.MaxValue for non-negative `b`. Idle-cell
    * timeouts compute `newest + retentionMs`; a caller-supplied retention
    * near Long.MaxValue would overflow negative and collapse the timeout
    * to `watermark + 1`, evicting live idle state on the next tick.
    */
  private def saturatingAdd(a: Long, b: Long): Long =
    if (a > Long.MaxValue - b) Long.MaxValue else a + b

  /** A1-style distribution counts as a streaming windowed aggregate:
    * tumbling event-time windows with a watermark bounding state.
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("window_start"),
        col(keyCol), col("cnt"))

  /** Streaming exact dedup — the streaming face of the J7/`j7_dedup_exact`
    * operator: duplicates of `idCols` arriving within the watermark bound
    * are dropped across micro-batches; the watermark expires the dedup
    * state so it stays bounded on an unbounded stream (the 100 TB/day
    * ingest shape — state size is one key per distinct id per watermark
    * window, not per event).
    */
  def streamingDedup(
      events: DataFrame,
      tsCol: String,
      idCols: Seq[String],
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Streaming PII redaction + per-kind counts — the streaming face of
    * `cur_pii_stats`/`cur_pii_redact` for an ingest-time curation
    * pipeline: STATELESS (pure projection over codegen'd regexp
    * functions), so it composes with any watermark/trigger and can never
    * accumulate state; a micro-batch's cost is exactly the batch
    * operator's scan cost. Parity with batch is pinned in
    * StreamingOpsSpec (same rows as the batch projection on the same
    * feed).
    *
    * `n_redacted` is the DETECTION count over the raw text (the batch
    * gates' semantics): on adversarial overlaps — a phone number embedded
    * in an email local part — it can exceed the number of substitutions
    * actually applied, because redaction consumes the outer match first.
    * No staging columns: only `n_redacted` and `textCol` itself are
    * (re)written, so caller columns survive untouched.
    */
  def streamingPiiRedact(docs: DataFrame, textCol: String): DataFrame = {
    import graft.text.TextOps
    val p = TextOps.piiCounts(col(textCol))
    docs
      .withColumn("n_redacted",
        p.getField("n_email") + p.getField("n_phone") + p.getField("n_ip"))
      .withColumn(textCol, TextOps.piiRedact(col(textCol)))
  }

  /** Streaming BPE encode — the ingest-time face of `tx_bpe_encode`:
    * merges are trained OFFLINE on the batch corpus ([[graft.text.Bpe.train]])
    * and ride the expression as a frozen artifact (exactly how production
    * tokenizers deploy — train once, encode forever); the stream stage is
    * a STATELESS projection through the same native kernel as batch, so
    * it composes with any watermark/trigger and batch==stream parity is
    * structural, not statistical. Appends `tokensCol` (array<string>);
    * caller columns survive untouched.
    */
  def streamingBpeEncode(docs: DataFrame, textCol: String, tokensCol: String,
      merges: Seq[graft.text.Bpe.Merge]): DataFrame =
    docs.withColumn(tokensCol,
      graft.text.Bpe.encodeTokens(col(textCol), merges))

  /** Streaming quality-classifier scoring — the ingest-time face of
    * `tx_quality_classifier`: weights are trained OFFLINE
    * ([[graft.text.QualityClassifier.train]]) and ride the projection as
    * literals (train once, score every arriving document — the fastText-
    * deployment shape); the stream stage is STATELESS (the same exact-IEEE
    * feature arithmetic as batch), so batch==stream parity is structural.
    * Appends `logitCol` (double); caller columns survive untouched.
    */
  def streamingQualityScore(docs: DataFrame, textCol: String,
      logitCol: String, weights: Array[Double]): DataFrame =
    docs.withColumn(logitCol,
      graft.text.QualityClassifier.logitColumn(col(textCol), weights))

  final case class Event(userId: Long, ts: Timestamp, eventType: String)
  final case class SessionState(start: Long, lastTs: Long, n: Int)
  final case class Session(userId: Long, startTs: Long, endTs: Long, nEvents: Int)

  /** Gap-based sessionization with `flatMapGroupsWithState`: a session
    * closes when no event arrives within `gapMs` (enforced by processing-
    * time timeout in continuous operation; by the final batch flush in
    * tests). The KeyValueGroupedDataset custom-state shape from the
    * builder contract — per-key state is O(1), the 100 TB streaming
    * answer to the reference's driver-side accumulation loops.
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toVector.sortBy(_.ts.getTime)
          val out = Vector.newBuilder[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastTs <= gapMs =>
                cur = Some(s.copy(lastTs = t, n = s.n + 1))
              case Some(s) =>
                out += Session(userId, s.start, s.lastTs, s.n)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur match {
            case Some(s) => state.update(s)
            case None    => state.remove()
          }
          out.result().iterator
      }
  }

  final case class SigDoc(docId: Long, sig: Long, tsMs: Long)
  final case class CellState(members: List[(Long, Long, Long)]) // (docId, sig, tsMs)
  final case class NearDupPair(d1: Long, d2: Long, hd: Int)

  final case class PayloadDoc(docId: Long, payload: Array[Byte], tsMs: Long)
  final case class LenientClipSig(
      docId: Long, sig: Option[Long], nFrames: Int,
      decodeError: Option[String], tsMs: Long)

  /** Streaming LENIENT clip-signature extraction — the streaming twin of
    * the batch lenient decode tier
    * ([[graft.multimodal.Multimodal.clipSignaturesLenient]], same
    * per-payload function, so parity holds by construction): each
    * arriving video payload decodes with prefix semantics; a corrupt
    * record yields an error-labelled row instead of FAILING THE
    * MICRO-BATCH (which is what the strict decoder would do — one garbled
    * sample would wedge the whole stream, with every restart re-reading
    * the same poison record). Stateless map: route rows with
    * `decodeError` to an audit sink, feed `sig`-bearing rows onward.
    */
  def streamingClipSignaturesLenient(
      docs: Dataset[PayloadDoc]): Dataset[LenientClipSig] = {
    import docs.sparkSession.implicits._
    docs.map { d =>
      val (sig, n, err) = graft.multimodal.Multimodal.clipSignatureLenient(d.payload)
      LenientClipSig(d.docId, sig, n, err, d.tsMs)
    }
  }

  /** Streaming LENIENT image/audio signature extraction — the remaining
    * two modalities of the lenient tier (video above): per-payload
    * perceptual hash ([[graft.multimodal.Multimodal.imageAHash]] /
    * `audioFingerprint`) under the same never-fail contract; a corrupt
    * payload yields `sig = None` + the parser's error label instead of
    * failing the micro-batch. `nFrames` is 1 for a decoded still/clip, 0
    * on error (keeping one row shape across all three modalities).
    * Compose with [[streamingSimhashPairs]] exactly like the video twin.
    */
  def streamingImageSignaturesLenient(
      docs: Dataset[PayloadDoc]): Dataset[LenientClipSig] = {
    import docs.sparkSession.implicits._
    import graft.multimodal.Multimodal
    docs.map { d =>
      val (sig, err) = Multimodal.signatureLeniently(d.payload)(b =>
        Multimodal.imageAHash(Multimodal.decodePpm(b)))
      LenientClipSig(d.docId, sig, if (sig.isDefined) 1 else 0, err, d.tsMs)
    }
  }

  /** [[streamingImageSignaturesLenient]] for WAV/PCM payloads. */
  def streamingAudioSignaturesLenient(
      docs: Dataset[PayloadDoc]): Dataset[LenientClipSig] = {
    import docs.sparkSession.implicits._
    import graft.multimodal.Multimodal
    docs.map { d =>
      val (sig, err) = Multimodal.signatureLeniently(d.payload)(b =>
        Multimodal.audioFingerprint(Multimodal.decodeWavPcm8(b)))
      LenientClipSig(d.docId, sig, if (sig.isDefined) 1 else 0, err, d.tsMs)
    }
  }

  /** Streaming LENIENT video near-dup: [[streamingClipSignaturesLenient]]
    * (undecodable payloads drop out of banding; truncated ones pair by
    * their prefix-vote signature) composed with [[streamingSimhashPairs]]
    * — the end-to-end "flag near-identical clips at ingest, survive the
    * corrupt ones" stream. Distinct-ed output equals the batch
    * [[graft.multimodal.Multimodal.videoNearDupPairsLenient]] pair set
    * (spec-pinned with a corrupt record mid-stream).
    */
  def streamingVideoNearDupPairsLenient(
      docs: Dataset[PayloadDoc],
      maxHamming: Int,
      bands: Int = 8,
      bits: Int = 64,
      retentionMs: Long = Long.MaxValue / 4,
      watermarkDelay: Option[String] = None): Dataset[NearDupPair] = {
    import docs.sparkSession.implicits._
    streamingSimhashPairs(
      streamingClipSignaturesLenient(docs)
        .flatMap(s => s.sig.map(g => SigDoc(s.docId, g, s.tsMs))),
      maxHamming, bands, bits, retentionMs, watermarkDelay)
  }

  /** Band-cell carriers: the exploded (cell, doc) rows CARRY their event
    * time as a real timestamp field, because the watermark must be applied
    * AFTER the typed explode and IMMEDIATELY BEFORE groupByKey — a typed
    * map re-serializes its output and strips the watermark attribute,
    * whereas groupByKey's AppendColumns preserves the child columns, so
    * this placement is what lets the analyzer see the watermark at the
    * flatMapGroupsWithState input and lets the state function read
    * `getCurrentWatermarkMs` / arm event-time timeouts.
    */
  final case class SigCell(cell: Long, doc: SigDoc, ets: java.sql.Timestamp)
  final case class ShingleCell(bucket: String, doc: ShingledDoc, ets: java.sql.Timestamp)

  private def watermarked[T: org.apache.spark.sql.Encoder](
      exploded: Dataset[T], delay: Option[String]): Dataset[T] =
    delay match {
      case Some(d) => exploded.withWatermark("ets", d)
      case None    => exploded
    }

  /** Streaming simhash near-dup: each arriving signature explodes into its
    * pigeonhole band cells (same (bands, bits) scheme as the batch
    * [[graft.text.Dedup.simhashPairs]]); per-cell `flatMapGroupsWithState`
    * keeps the cell's recent members and emits a [[NearDupPair]] the moment
    * a new doc lands within `maxHamming` of one — the "flag near-identical
    * documents as they're ingested" op a training pipeline runs ahead of
    * the batch dedup.
    *
    * State is BOUNDED: members older than `retentionMs` behind the cell's
    * newest arrival are evicted each batch, so per-cell state is the cell's
    * arrival rate × retention window, not the stream's history. With
    * `watermarkDelay` set the bound holds under OUT-OF-ORDER arrival too —
    * arrivals behind the watermark are dropped (they would otherwise pair
    * against already-evicted history), members behind
    * `watermark − retentionMs` are evicted before pairing, and IDLE cells
    * are removed by an event-time timeout when the watermark passes
    * `newest + retentionMs` (without it an idle cell's members sat in state
    * forever). A pair colliding in several bands emits once PER COLLIDING
    * BAND (at-least-once semantics); pipe through
    * `dropDuplicatesWithinWatermark("d1", "d2")` for exactly-once, as the
    * parity test does with a plain distinct at the sink.
    */
  def streamingSimhashPairs(
      docs: Dataset[SigDoc],
      maxHamming: Int,
      bands: Int = 4,
      bits: Int = 60,
      retentionMs: Long = Long.MaxValue / 4,
      watermarkDelay: Option[String] = None): Dataset[NearDupPair] = {
    require(retentionMs >= 0, "retentionMs must be non-negative")
    require(bands > maxHamming, "pigeonhole guarantee needs bands > maxHamming")
    require(bits % bands == 0, "bands must divide bits")
    import docs.sparkSession.implicits._
    val width = bits / bands
    val mask = (1L << width) - 1
    val eventTime = watermarkDelay.isDefined
    val timeout =
      if (eventTime) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    watermarked(
      docs.flatMap(d => (0 until bands).map(b =>
        SigCell((b.toLong << width) | ((d.sig >>> (b * width)) & mask), d,
          new java.sql.Timestamp(d.tsMs)))),
      watermarkDelay)
      .groupByKey(_.cell)
      .flatMapGroupsWithState[CellState, NearDupPair](
        OutputMode.Append(), timeout) {
        (_: Long, it: Iterator[SigCell], state: GroupState[CellState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = if (eventTime) state.getCurrentWatermarkMs() else Long.MinValue
            val arrivals = it.map(_.doc).filter(_.tsMs >= wm)
              .toVector.sortBy(d => (d.tsMs, d.docId))
            var members = state.getOption.map(_.members).getOrElse(Nil)
            if (eventTime && wm > Long.MinValue)
              members = members.filter(_._3 >= wm - retentionMs)
            val out = Vector.newBuilder[NearDupPair]
            arrivals.foreach { d =>
              members.foreach { case (id, sig, _) =>
                if (id != d.docId) {
                  val hd = java.lang.Long.bitCount(sig ^ d.sig)
                  if (hd <= maxHamming)
                    out += NearDupPair(math.min(id, d.docId), math.max(id, d.docId), hd)
                }
              }
              members = (d.docId, d.sig, d.tsMs) :: members
            }
            val newest = members.iterator.map(_._3).foldLeft(Long.MinValue)(math.max)
            members = members.filter(_._3 >= newest - retentionMs)
            if (members.isEmpty) state.remove()
            else {
              state.update(CellState(members))
              if (eventTime)
                state.setTimeoutTimestamp(math.max(wm + 1, saturatingAdd(newest, retentionMs)))
            }
            out.result().iterator
          }
      }
  }

  final case class ShingledDoc(docId: Long, shingles: Seq[String], tsMs: Long)
  final case class MinhashCellState(
      members: List[(Long, Seq[String], Long)]) // (docId, shingles, tsMs)
  final case class JaccardPair(d1: Long, d2: Long, inter: Long, j: Double)

  /** Streaming MinHash-LSH near-dup: the streaming twin of the batch
    * [[graft.text.Dedup.minhashLshPairs]] (`dd_minhash_lsh`), built on the
    * SAME bounded per-band-cell state shape as [[streamingSimhashPairs]].
    * Each arriving document computes its MinHash signature once
    * ([[graft.text.Dedup.minhashSigOf]] — identical arithmetic to the
    * batch column), explodes into its `bands` band-bucket cells, and the
    * per-cell `flatMapGroupsWithState` emits an exact-Jaccard-verified
    * [[JaccardPair]] the moment a new arrival lands in a cell with a
    * member above `threshold` — same verification arithmetic (distinct
    * shingle intersection, floor-form 6dp rounding) as the batch, so the
    * distinct-ed stream output equals the batch pair set whenever banding
    * catches every true pair (P[miss] = (1−J^r)^b, the batch operator's
    * own guarantee).
    *
    * State is BOUNDED exactly as in the simhash twin: members older than
    * `retentionMs` behind the cell's newest arrival are evicted per batch
    * — per-cell state is arrival-rate × retention (shingle sets included,
    * so size the retention for document payloads, not signatures) — and
    * `watermarkDelay` adds the same out-of-order rigor (late-arrival drop,
    * watermark eviction, idle-cell event-time timeout; see
    * [[streamingSimhashPairs]]). A pair colliding in several bands emits
    * once per band (at-least-once); distinct at the sink for exactly-once,
    * as with the simhash twin.
    */
  def streamingMinhashPairs(
      docs: Dataset[ShingledDoc],
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 16,
      retentionMs: Long = Long.MaxValue / 4,
      watermarkDelay: Option[String] = None): Dataset[JaccardPair] = {
    require(retentionMs >= 0, "retentionMs must be non-negative")
    require(numHashes % bands == 0, "bands must divide numHashes")
    import docs.sparkSession.implicits._
    val r = numHashes / bands
    val eventTime = watermarkDelay.isDefined
    val timeout =
      if (eventTime) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    watermarked(
      docs.flatMap { d0 =>
        // shingle sets are SETS: dedup on ingest so the exact-Jaccard
        // verify below matches the batch operator (whose shingleUdf dedups
        // via LinkedHashSet) even when a caller feeds duplicated shingles
        // — duplicates cannot change the MinHash minima, but they would
        // silently inflate |A|,|B| and inter in the verification
        val d = d0.copy(shingles = d0.shingles.distinct)
        val sig = graft.text.Dedup.minhashSigOf(d.shingles, numHashes)
        (0 until bands).map { b =>
          val bucket = (b +: (0 until r).map(i => sig(b * r + i))).mkString("_")
          ShingleCell(bucket, d, new java.sql.Timestamp(d.tsMs))
        }
      },
      watermarkDelay)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[MinhashCellState, JaccardPair](
        OutputMode.Append(), timeout) {
        (_: String, it: Iterator[ShingleCell],
         state: GroupState[MinhashCellState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val wm = if (eventTime) state.getCurrentWatermarkMs() else Long.MinValue
            val arrivals = it.map(_.doc).filter(_.tsMs >= wm)
              .toVector.sortBy(d => (d.tsMs, d.docId))
            var members = state.getOption.map(_.members).getOrElse(Nil)
            if (eventTime && wm > Long.MinValue)
              members = members.filter(_._3 >= wm - retentionMs)
            val out = Vector.newBuilder[JaccardPair]
            arrivals.foreach { d =>
              val newSet = d.shingles.toSet
              members.foreach { case (id, sh, _) =>
                if (id != d.docId) {
                  val inter = sh.count(newSet.contains).toLong
                  val union = sh.size + d.shingles.size - inter
                  if (union > 0) {
                    val jraw = inter.toDouble / union
                    if (jraw >= threshold) {
                      // same floor-form 6dp rounding as the batch operator
                      val j = math.floor(jraw * 1000000.0 + 0.5) / 1000000.0
                      out += JaccardPair(
                        math.min(id, d.docId), math.max(id, d.docId), inter, j)
                    }
                  }
                }
              }
              members = (d.docId, d.shingles, d.tsMs) :: members
            }
            val newest = members.iterator.map(_._3).foldLeft(Long.MinValue)(math.max)
            members = members.filter(_._3 >= newest - retentionMs)
            if (members.isEmpty) state.remove()
            else {
              state.update(MinhashCellState(members))
              if (eventTime)
                state.setTimeoutTimestamp(math.max(wm + 1, saturatingAdd(newest, retentionMs)))
            }
            out.result().iterator
          }
      }
  }

  /** Flush any open sessions (test/batch-end helper): every state entry
    * becomes a final session row.
    */
  def currentOpenSessions(
      events: Dataset[Event],
      gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .mapGroups { (userId, it) =>
        val sorted = it.toVector.sortBy(_.ts.getTime)
        var cur: Option[SessionState] = None
        var last: Option[Session] = None
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.lastTs <= gapMs =>
              cur = Some(s.copy(lastTs = t, n = s.n + 1))
            case Some(s) =>
              last = Some(Session(userId, s.start, s.lastTs, s.n))
              cur = Some(SessionState(t, t, 1))
            case None => cur = Some(SessionState(t, t, 1))
          }
        }
        cur.map(s => Session(userId, s.start, s.lastTs, s.n))
          .orElse(last)
          .getOrElse(Session(userId, 0, 0, 0))
      }
  }
}
