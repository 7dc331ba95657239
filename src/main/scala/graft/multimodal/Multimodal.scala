package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal asset: an opaque binary payload + typed metadata. The
  * decode step is a clearly-marked deterministic STUB (no image/audio
  * codecs in this environment) — the Spark-side plumbing (schema,
  * batching, partitioning, feature shapes) is real and tested, and the
  * stub swaps for a real decoder without touching any plumbing.
  */
final case class MediaAsset(
    assetId: Long,
    mediaType: String, // image | audio | video
    payload: Array[Byte],
    width: Int,
    height: Int,
    sampleRateHz: Int)

final case class MediaFeatures(
    assetId: Long,
    mediaType: String,
    payloadLen: Int,
    nFrames: Int,
    byteHistogramHead: Seq[Long], // first 8 buckets of the byte histogram
    checksum: Long)

object Multimodal {

  /** STUB decode: a real implementation would decode the payload with an
    * image/audio codec; the deterministic fake derives features purely
    * from the bytes so tests are stable. Marked per the builder contract.
    */
  def decodeStub(payload: Array[Byte]): (Array[Long], Long) = {
    val hist = new Array[Long](8)
    var checksum = 0L
    var i = 0
    while (i < payload.length) {
      hist(java.lang.Byte.toUnsignedInt(payload(i)) % 8) += 1
      checksum = (checksum * 31 + java.lang.Byte.toUnsignedInt(payload(i))) % 1000000007L
      i += 1
    }
    (hist, checksum)
  }

  /** Frame sampling: byte offsets of every `stride`-th frame start — the
    * video-pipeline shape (decode only sampled frames, not the stream).
    */
  def sampleFrameOffsets(payloadLen: Int, frameSize: Int, stride: Int): Seq[Int] = {
    require(frameSize > 0 && stride > 0)
    (0 until payloadLen / frameSize by stride).map(_ * frameSize)
  }

  /** Distributed feature extraction. `mapPartitions` (not per-row map) is
    * deliberate: a real decoder amortizes codec init per partition — the
    * batch shape a Pandas-UDF/Arrow pipeline would use, expressed
    * Dataset-native.
    */
  def extractFeatures(assets: Dataset[MediaAsset], frameSize: Int = 1024): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition "codec" init happens here in a real decoder
      it.map { a =>
        val (hist, checksum) = decodeStub(a.payload)
        MediaFeatures(a.assetId, a.mediaType, a.payload.length,
          a.payload.length / frameSize, hist.toSeq, checksum)
      }
    }
  }

  /** Frame sampling as a 1→N generator over the payload column — the
    * video-pipeline shape (decode only every `stride`-th frame) with the
    * whole plumbing in oracle-matchable column expressions: frames are
    * `frameSize`-char windows, every `stride`-th full frame explodes to a
    * row carrying its offset and a polynomial fingerprint (the stub for
    * per-frame decode output). Scale shape: map-side explode, no shuffle
    * until the caller aggregates.
    */
  def frameSample(
      docs: DataFrame,
      idCol: String,
      payloadCol: String,
      frameSize: Int,
      stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0)
    docs.select(
        col(idCol).as("doc_id"),
        col(payloadCol).as("t"),
        floor(length(col(payloadCol)) / frameSize).cast("int").as("n_frames"))
      .where(col("n_frames") > 0)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .select(
        col("doc_id"),
        col("frame_idx"),
        (col("frame_idx") * frameSize).cast("int").as("frame_off"),
        graft.text.TextOps.polyHash(
          expr(s"substring(t, frame_idx * $frameSize + 1, $frameSize)")).as("frame_fp"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Perceptual-hash STUB over the payload: a real implementation hashes
    * decoded image/audio features; the deterministic fake frames the
    * payload (`frameSize`-char windows, full frames only) and majority-
    * votes each frame's two polynomial fingerprints into a 60-bit
    * signature — the same simhash vote rule as [[graft.text.Dedup.simhash]]
    * but with FRAMES as the feature unit, so payloads sharing most frames
    * land within a small hamming distance. Swap the frame fingerprint for
    * codec output and the near-dup machinery downstream is unchanged.
    */
  def phash(payload: Column, frameSize: Int): Column = {
    require(frameSize > 0)
    val udfImpl = udf { (s: String) =>
      val nFrames = s.length / frameSize
      val votes = new Array[Int](60)
      var f = 0
      while (f < nFrames) {
        var h1 = 0L
        var h2 = 0L
        var i = f * frameSize
        val end = i + frameSize
        while (i < end) {
          val c = s.charAt(i).toLong
          h1 = (h1 * 31 + c) % 1000000007L
          h2 = (h2 * 131 + c) % 1000000007L
          i += 1
        }
        var b = 0
        while (b < 30) {
          votes(b) += (if (((h1 >> b) & 1L) == 1L) 1 else -1)
          votes(b + 30) += (if (((h2 >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
        f += 1
      }
      var sig = 0L
      var b = 0
      while (b < 60) {
        if (votes(b) > 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
    udfImpl(payload)
  }

  /** Payload-level stats as pure column expressions (oracle-matchable):
    * byte length of the UTF-8 payload, frame count at a fixed frame size,
    * and the polynomial checksum of the text form.
    */
  def payloadStats(docs: DataFrame, idCol: String, textCol: String, frameSize: Int): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      octet_length(col(textCol)).as("payload_len"),
      floor(octet_length(col(textCol)) / frameSize).cast("int").as("n_frames"),
      graft.text.TextOps.polyHash(col(textCol)).as("checksum"))
      .orderBy("doc_id")
}
