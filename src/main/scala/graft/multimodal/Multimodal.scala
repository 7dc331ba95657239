package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One multimodal asset: an opaque binary payload + typed metadata. Two
  * decode tiers coexist: [[Multimodal.decodePpm]] is a REAL byte decoder
  * (binary PPM/P6 — raw RGB, no codec library needed) feeding real
  * per-pixel features ([[Multimodal.imageAHash]], channel means), pinned
  * by differential tests against independently-computed expected values
  * on committed binary fixtures; [[Multimodal.decodeStub]] remains for
  * the text-table gate queries (the driver testdata carries no binary
  * media), clearly marked. Compressed codecs (JPEG/MP3/H.264) stay out —
  * no codec libs in this environment — but the full pipeline below the
  * decode (schema, batching, banding, near-dup) is identical either way.
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

/** A decoded raster image: `rgb` is row-major packed R,G,B bytes. */
final case class DecodedImage(width: Int, height: Int, rgb: Array[Byte])

/** Decoded mono 8-bit PCM audio: `samples` are unsigned (midpoint 128). */
final case class DecodedAudio(sampleRate: Int, samples: Array[Byte])

object Multimodal {

  /** REAL image decode: binary PPM (P6) — `P6 <w> <h> <maxval>` header
    * (whitespace-separated, `#` comments allowed) followed by one
    * whitespace byte and the raw RGB raster. Fails fast on malformed
    * input rather than guessing. PPM is the simplest real public raster
    * format; it exercises an actual bytes→pixels decode (header grammar,
    * raster bounds) without a codec dependency.
    */
  def decodePpm(bytes: Array[Byte]): DecodedImage = decodePpmAt(bytes, 0)._1

  /** One PPM frame starting at `offset`; returns (frame, next offset) so
    * [[decodeFrames]] can walk a concatenated multi-frame stream — each
    * frame's raster length comes from ITS OWN header, so frame sizes may
    * vary within one payload.
    */
  private def decodePpmAt(bytes: Array[Byte], offset: Int): (DecodedImage, Int) = {
    val (w, h, rasterStart) = ppmHeader(bytes, offset)
    val next = rasterStart + w * h * 3
    (DecodedImage(w, h, java.util.Arrays.copyOfRange(bytes, rasterStart, next)),
      next)
  }

  /** Validated header walk: (width, height, raster offset) of the frame at
    * `offset`, bounds-checked against the remaining bytes — the shared
    * parse under [[decodePpmAt]] (which copies the raster) and
    * [[sampleFrames]]' skip path (which only advances past it).
    */
  private def ppmHeader(bytes: Array[Byte], offset: Int): (Int, Int, Int) = {
    var pos = offset
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed PPM at byte $offset: $msg")
    def token(): String = {
      while (pos < bytes.length &&
             (bytes(pos) == '#' || Character.isWhitespace(bytes(pos).toChar))) {
        if (bytes(pos) == '#')
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < bytes.length && !Character.isWhitespace(bytes(pos).toChar)) pos += 1
      if (start == pos) err("truncated header")
      new String(bytes, start, pos - start, java.nio.charset.StandardCharsets.US_ASCII)
    }
    val magic = token()
    if (magic != "P6") err(s"magic '$magic' is not P6")
    val w = token().toInt
    val h = token().toInt
    val maxv = token().toInt
    if (w <= 0 || h <= 0) err(s"bad dimensions ${w}x$h")
    if (maxv != 255) err(s"unsupported maxval $maxv (8-bit only)")
    pos += 1 // exactly one whitespace byte separates maxval from the raster
    val need = w.toLong * h * 3
    if (bytes.length - pos < need) err(s"raster truncated: need $need bytes")
    (w, h, pos)
  }

  /** REAL multi-frame decode: a video-shaped payload of CONCATENATED PPM
    * frames (the uncompressed analogue of an MJPEG stream) walks frame by
    * frame — each frame's own header drives how many raster bytes to
    * consume, so mixed frame sizes are fine and a malformed frame fails
    * fast with its byte offset. `maxFrames` bounds a corrupt-length
    * runaway on untrusted bytes.
    */
  def decodeFrames(bytes: Array[Byte], maxFrames: Int = 100000): Seq[DecodedImage] = {
    val out = Vector.newBuilder[DecodedImage]
    var pos = 0
    var n = 0
    while (pos < bytes.length) {
      require(n < maxFrames, s"decodeFrames: more than $maxFrames frames")
      val (img, next) = decodePpmAt(bytes, pos)
      out += img
      pos = next
      n += 1
    }
    out.result()
  }

  /** Sampled multi-frame decode: every `stride`-th frame of a
    * concatenated-PPM stream, MATERIALIZING ONLY the sampled rasters —
    * unsampled frames cost a header parse plus a length skip (the real
    * video-pipeline economics: headers are bytes, rasters are megabytes).
    * Returns (frame index, frame) pairs so callers keep stream positions.
    */
  def sampleFrames(
      bytes: Array[Byte], stride: Int,
      maxFrames: Int = 100000): Seq[(Int, DecodedImage)] = {
    require(stride > 0, "stride must be positive")
    val out = Vector.newBuilder[(Int, DecodedImage)]
    var pos = 0
    var i = 0
    while (pos < bytes.length) {
      require(i < maxFrames, s"sampleFrames: more than $maxFrames frames")
      if (i % stride == 0) {
        val (img, next) = decodePpmAt(bytes, pos)
        out += ((i, img))
        pos = next
      } else {
        pos = skipPpmAt(bytes, pos) // header parse + raster skip, no copy
      }
      i += 1
    }
    out.result()
  }

  /** Header-only walk step: validates frame `offset`'s header and returns
    * the next frame's offset without touching the raster bytes.
    */
  private def skipPpmAt(bytes: Array[Byte], offset: Int): Int = {
    val (w, h, rasterStart) = ppmHeader(bytes, offset)
    rasterStart + w * h * 3
  }

  /** Distributed REAL video decode: one row per frame with the frame's
    * dimensions and [[imageAHash]] — the per-frame fingerprint a
    * scene-dedup or sampled-decode pipeline keys on. Map-side explode
    * (flatMap), no shuffle until the caller aggregates.
    */
  def decodeVideoFrames(
      assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"), col(payloadCol).as("p"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeFrames(bytes).iterator.zipWithIndex.map { case (img, i) =>
          (id, i, img.width, img.height, imageAHash(img))
        }
      }
      .toDF("asset_id", "frame_idx", "width", "height", "frame_phash")
  }

  /** Distributed SAMPLED video decode: the [[sampleFrames]] stride walk as
    * an operator — one row per SAMPLED frame (index, dims, [[imageAHash]]),
    * with unsampled frames costing a header parse + raster skip and never
    * being materialized. This is the shape video pipelines actually run at
    * scale (decode every Nth frame, not the stream); like
    * [[decodeVideoFrames]] it is a map-side explode — payloads stay in
    * their input partition.
    */
  def sampleVideoFrames(
      assets: DataFrame, idCol: String, payloadCol: String,
      stride: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"), col(payloadCol).as("p"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        sampleFrames(bytes, stride).iterator.map { case (i, img) =>
          (id, i, img.width, img.height, imageAHash(img))
        }
      }
      .toDF("asset_id", "frame_idx", "width", "height", "frame_phash")
  }

  /** REAL perceptual hash over decoded pixels: average-hash (aHash) —
    * integer-exact so it reproduces bit-for-bit across languages (the
    * committed fixtures carry expected values computed by an independent
    * implementation). Luma per pixel as 299R+587G+114B (milli-scaled, no
    * division); the image splits into an 8×8 block grid (floor
    * boundaries); bit (row*8+col) is set iff the block's mean luma
    * exceeds the global mean — compared by integer cross-multiply, so no
    * float ever enters. Images sharing most content land within a small
    * hamming distance, feeding the same banding machinery as simhash.
    */
  def imageAHash(img: DecodedImage): Long = {
    val w = img.width
    val h = img.height
    require(w.toLong * h <= (1L << 24),
      s"imageAHash: ${w}x$h exceeds the exact-integer-arithmetic bound (2^24 px)")
    val lum = new Array[Long](w * h)
    var total = 0L
    var p = 0
    var i = 0
    while (i < lum.length) {
      val l = 299L * (img.rgb(p) & 0xff) + 587L * (img.rgb(p + 1) & 0xff) +
        114L * (img.rgb(p + 2) & 0xff)
      lum(i) = l
      total += l
      p += 3
      i += 1
    }
    val totalPx = w.toLong * h
    var sig = 0L
    var by = 0
    while (by < 8) {
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += lum(y * w + x); x += 1 }
          y += 1
        }
        val cnt = (y1 - y0).toLong * (x1 - x0)
        // block mean > global mean, exactly: s/cnt > total/totalPx
        if (cnt > 0 && s * totalPx > total * cnt) sig |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    sig
  }

  /** Distributed REAL decode + feature extraction over a binary payload
    * column: width/height, floor channel means, and [[imageAHash]] per
    * asset — all map-side, no shuffle. The UDF is the honest choice here:
    * a bytes→pixels decoder is genuine per-row imperative logic, not an
    * expressible column expression.
    */
  /** Feature tuple for one decoded image — the ONE implementation the
    * strict and lenient UDFs share, so their clean-row outputs can never
    * drift apart.
    */
  private def imageFeats(img: DecodedImage): (Int, Int, Int, Int, Int, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    var p = 0
    while (p < img.rgb.length) {
      r += img.rgb(p) & 0xff; g += img.rgb(p + 1) & 0xff; b += img.rgb(p + 2) & 0xff
      p += 3
    }
    val n = img.width.toLong * img.height
    (img.width, img.height, (r / n).toInt, (g / n).toInt, (b / n).toInt,
      imageAHash(img))
  }

  def decodeImageFeatures(
      assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) => imageFeats(decodePpm(bytes)) }
    assets
      .select(col(idCol).as("asset_id"), f(col(payloadCol)).as("f"))
      .select(col("asset_id"),
        col("f._1").as("width"), col("f._2").as("height"),
        col("f._3").as("mean_r"), col("f._4").as("mean_g"),
        col("f._5").as("mean_b"), col("f._6").as("phash"))
  }

  /** Near-identical image pairs over a binary payload column: REAL decode
    * → [[imageAHash]] → the SAME pigeonhole banding as text simhash
    * ([[graft.text.Dedup.simhashPairs]], 8 bands × 8 bits) — decode swaps,
    * everything downstream is shared. Output: (d1, d2, hd), sorted.
    *
    * The signature frame is materialized EAGERLY ([[signedOnce]]) so the
    * payload decode runs exactly once — see the note there.
    */
  def imageNearDupPairs(
      assets: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int, bands: Int = 8): DataFrame =
    graft.text.Dedup.simhashPairs(
      signedOnce(decodeImageFeatures(assets, idCol, payloadCol)
        .select(col("asset_id").as("doc_id"), col("phash").as("simhash"))),
      maxHamming, bands = bands, bits = 64)

  /** r20 (guide §2.3/§8 — decide with small rows, decode big rows once):
    * [[graft.text.Dedup.simhashPairs]] consumes its signature frame in
    * THREE plan branches (distinct-sig banding, the hd-0 self-join, the
    * cross-sig expansion), and broadcast joins at gate scale give those
    * branches no common exchange to reuse — so a decode-UDF signature
    * source re-decoded every payload up to five times. The signature rows
    * are 16 bytes each regardless of payload size, so one eager
    * localCheckpoint materializes the proxy and every branch reads blocks
    * instead of re-decoding. Blocks live until the returned frame is GC'd
    * (ContextCleaner), the components family's eager-action lifetime;
    * executor-local like every localCheckpoint here (fine on local[N] —
    * cluster callers wanting fault tolerance materialize signatures to a
    * table themselves).
    */
  private def signedOnce(signed: DataFrame): DataFrame =
    signed.localCheckpoint(true)

  /** REAL audio decode: canonical RIFF/WAVE with 8-bit mono PCM — the
    * chunk walk is a genuine parse (magic, chunk sizes, word-aligned skip
    * of unknown chunks, fmt validation, data bounds), not a fixed-offset
    * read, so files with extra chunks (LIST/INFO etc.) decode correctly.
    * Compressed/16-bit/stereo forms are rejected explicitly rather than
    * mis-read. Samples are unsigned 8-bit (midpoint 128) per the WAV spec.
    */
  def decodeWavPcm8(bytes: Array[Byte]): DecodedAudio = {
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"malformed WAV: $msg")
    def u16(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def tag(off: Int): String =
      if (off + 4 > bytes.length) err("truncated chunk tag")
      else new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || tag(0) != "RIFF") err("not RIFF")
    if (tag(8) != "WAVE") err("not WAVE")
    var pos = 12
    var sampleRate = -1
    var data: Array[Byte] = null
    while (pos + 8 <= bytes.length && (sampleRate < 0 || data == null)) {
      val t = tag(pos)
      val sz = u32(pos + 4)
      if (pos + 8 + sz > bytes.length) err(s"chunk '$t' overruns the file")
      t match {
        case "fmt " =>
          if (sz < 16) err("fmt chunk too short")
          val fmt = u16(pos + 8)
          val channels = u16(pos + 10)
          val bits = u16(pos + 22)
          if (fmt != 1) err(s"audio format $fmt is not PCM")
          if (channels != 1) err(s"$channels channels (mono only)")
          if (bits != 8) err(s"$bits-bit samples (8-bit only)")
          sampleRate = u32(pos + 12).toInt
        case "data" =>
          data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + sz.toInt)
        case _ => () // unknown chunk: skip
      }
      pos += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    if (sampleRate < 0) err("no fmt chunk")
    if (data == null) err("no data chunk")
    DecodedAudio(sampleRate, data)
  }

  /** Distributed REAL audio decode + integer-exact features over a binary
    * payload column: sample count/rate, floor mean amplitude, peak,
    * floor mean square deviation from the 8-bit midpoint (RMS² — kept
    * squared so no float enters), and midpoint crossings (the
    * zero-crossing rate's numerator). Map-side only, like the image twin.
    */
  /** Feature tuple for one decoded clip — shared by the strict and
    * lenient UDFs (see [[imageFeats]]).
    */
  private def audioFeats(a: DecodedAudio): (Int, Int, Int, Int, Long, Int) = {
    val n = a.samples.length
    require(n > 0, "empty data chunk")
    var sum = 0L; var peak = 0; var sq = 0L; var crossings = 0
    var i = 0
    while (i < n) {
      val v = a.samples(i) & 0xff
      sum += v
      if (v > peak) peak = v
      val d = v - 128L
      sq += d * d
      if (i > 0 && ((a.samples(i - 1) & 0xff) < 128) != (v < 128)) crossings += 1
      i += 1
    }
    (a.sampleRate, n, (sum / n).toInt, peak, sq / n, crossings)
  }

  def decodeAudioFeatures(
      assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) => audioFeats(decodeWavPcm8(bytes)) }
    assets
      .select(col(idCol).as("asset_id"), f(col(payloadCol)).as("f"))
      .select(col("asset_id"),
        col("f._1").as("sample_rate"), col("f._2").as("n_samples"),
        col("f._3").as("mean_amp"), col("f._4").as("peak"),
        col("f._5").as("rms_sq"), col("f._6").as("crossings"))
  }

  /** REAL integer box resize: output pixel (x,y) averages the source box
    * with floor boundaries [x·w/outW, (x+1)·w/outW) × [y·h/outH,
    * (y+1)·h/outH), floor mean per channel — the downscale step of any
    * image feature pipeline (and the arithmetic [[imageAHash]]'s block
    * grid embeds), exposed standalone so thumbnails/feature inputs share
    * one exact definition. Upscale is out of scope (boxes would be empty).
    */
  def resizeBox(img: DecodedImage, outW: Int, outH: Int): DecodedImage = {
    require(outW > 0 && outH > 0 && outW <= img.width && outH <= img.height,
      s"resizeBox: ${img.width}x${img.height} -> ${outW}x$outH must downscale")
    val out = new Array[Byte](outW * outH * 3)
    var oy = 0
    while (oy < outH) {
      val y0 = oy * img.height / outH; val y1 = (oy + 1) * img.height / outH
      var ox = 0
      while (ox < outW) {
        val x0 = ox * img.width / outW; val x1 = (ox + 1) * img.width / outW
        var r = 0L; var g = 0L; var b = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = (y * img.width + x) * 3
            r += img.rgb(p) & 0xff; g += img.rgb(p + 1) & 0xff; b += img.rgb(p + 2) & 0xff
            x += 1
          }
          y += 1
        }
        val cnt = (y1 - y0).toLong * (x1 - x0)
        val o = (oy * outW + ox) * 3
        out(o) = (r / cnt).toByte; out(o + 1) = (g / cnt).toByte; out(o + 2) = (b / cnt).toByte
        ox += 1
      }
      oy += 1
    }
    DecodedImage(outW, outH, out)
  }

  /** Distributed decode → integer box resize → features: the standard
    * image-dedup normalization step (resize-then-hash gives inputs of any
    * dimensions one comparable signature). Same map-side economics as
    * [[decodeImageFeatures]]; the emitted width/height/means/phash are
    * those of the RESIZED raster, and the arithmetic is [[resizeBox]]'s
    * exact floor box means feeding [[imageAHash]] — no float anywhere.
    */
  def decodeResizedImageFeatures(
      assets: DataFrame, idCol: String, payloadCol: String,
      outW: Int, outH: Int): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      imageFeats(resizeBox(decodePpm(bytes), outW, outH))
    }
    assets
      .select(col(idCol).as("asset_id"), f(col(payloadCol)).as("f"))
      .select(col("asset_id"),
        col("f._1").as("width"), col("f._2").as("height"),
        col("f._3").as("mean_r"), col("f._4").as("mean_g"),
        col("f._5").as("mean_b"), col("f._6").as("phash"))
  }

  /** REAL audio fingerprint over decoded samples: the audio analogue of
    * [[imageAHash]] — 64 windows with floor boundaries over the sample
    * run; per-window ENERGY (squared deviation from the 8-bit midpoint,
    * all integer); bit w set iff the window's mean energy exceeds the
    * global mean (integer cross-multiply). Clips sharing most content
    * land within a small hamming distance, so near-identical-clip
    * detection rides the same pigeonhole banding as text/image.
    */
  def audioFingerprint(a: DecodedAudio): Long = {
    val n = a.samples.length
    require(n > 0, "audioFingerprint: empty sample run")
    require(n.toLong <= (1L << 24),
      s"audioFingerprint: $n samples exceeds the exact-arithmetic bound (2^24)")
    val en = new Array[Long](n)
    var total = 0L
    var i = 0
    while (i < n) {
      val d = (a.samples(i) & 0xff) - 128L
      en(i) = d * d
      total += en(i)
      i += 1
    }
    var sig = 0L
    var w = 0
    while (w < 64) {
      val s0 = w * n / 64; val s1 = (w + 1) * n / 64
      var s = 0L
      var j = s0
      while (j < s1) { s += en(j); j += 1 }
      val cnt = (s1 - s0).toLong
      if (cnt > 0 && s * n > total * cnt) sig |= 1L << w
      w += 1
    }
    sig
  }

  /** Near-identical audio clips over a binary payload column: REAL WAV
    * decode → [[audioFingerprint]] → the SAME pigeonhole banding as text
    * simhash and image near-dup. Output: (d1, d2, hd), sorted.
    */
  def audioNearDupPairs(
      assets: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int, bands: Int = 8): DataFrame = {
    val f = udf { (bytes: Array[Byte]) => audioFingerprint(decodeWavPcm8(bytes)) }
    graft.text.Dedup.simhashPairs(
      signedOnce(
        assets.select(col(idCol).as("doc_id"), f(col(payloadCol)).as("simhash"))),
      maxHamming, bands = bands, bits = 64)
  }

  /** Clip-level video signature: bit-majority vote across the clip's
    * per-frame [[imageAHash]] fingerprints — bit b of the signature is set
    * iff MORE frames set bit b than clear it (ties clear), the simhash
    * vote rule with whole frames as the feature unit. Clips sharing most
    * frames land within a small hamming distance, so near-identical-video
    * detection rides the same pigeonhole banding as text/image/audio. A
    * frame whose raster is smaller than the 8×8 grid contributes a sparse
    * hash (only its populated block bits vote +1), which the vote handles
    * uniformly.
    */
  def clipSignature(frameHashes: Seq[Long]): Long = {
    require(frameHashes.nonEmpty, "clipSignature: no frames")
    var sig = 0L
    var b = 0
    while (b < 64) {
      var v = 0
      val it = frameHashes.iterator
      while (it.hasNext) v += (if (((it.next() >> b) & 1L) != 0L) 1 else -1)
      if (v > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Near-identical video clips over a binary payload column of
    * concatenated PPM frames: REAL multi-frame decode ([[decodeFrames]],
    * each raster length from its own header) → per-frame [[imageAHash]] →
    * [[clipSignature]] majority vote → the SAME pigeonhole banding as
    * text simhash and image/audio near-dup
    * ([[graft.text.Dedup.simhashPairs]]). Decode and vote are map-side;
    * only (doc_id, 64-bit signature) rows enter the shuffle — payloads
    * never leave their input partition, the economics a 100 TB video
    * corpus requires. Output: (d1, d2, hd), sorted.
    */
  def videoNearDupPairs(
      assets: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int, bands: Int = 8): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      clipSignature(decodeFrames(bytes).map(imageAHash))
    }
    graft.text.Dedup.simhashPairs(
      signedOnce(
        assets.select(col(idCol).as("doc_id"), f(col(payloadCol)).as("simhash"))),
      maxHamming, bands = bands, bits = 64)
  }

  /** The LENIENT per-payload clip fingerprint shared by the batch
    * ([[clipSignaturesLenient]]) and streaming
    * ([[graft.streaming.StreamingOps.streamingClipSignaturesLenient]])
    * tiers — one function, so batch/streaming parity holds by
    * construction. Prefix semantics of [[decodeFramesLenient]]: frames
    * decoded before the first malformed byte still vote (a truncated tail
    * keeps a usable — hamming-close — signature plus the error label); a
    * payload with NO decodable frame yields (None, 0, error) instead of a
    * task/micro-batch failure.
    */
  def clipSignatureLenient(bytes: Array[Byte]): (Option[Long], Int, Option[String]) = {
    val (frames, err) = decodeFramesLenient(bytes)
    val sig =
      if (frames.nonEmpty) Some(clipSignature(frames.map(imageAHash))) else None
    (sig, frames.length,
      if (frames.isEmpty && err.isEmpty) Some("no decodable frames") else err)
  }

  /** LENIENT clip signatures: (doc_id, simhash, n_frames, decode_error)
    * per payload — the corrupt-corpus form of the [[videoNearDupPairs]]
    * signature stage. Clean payloads carry a null error; truncated
    * payloads keep their prefix-vote signature AND the error label;
    * undecodable payloads carry a null signature. Callers filter
    * `simhash IS NOT NULL` for pairing and audit the rest.
    */
  def clipSignaturesLenient(
      assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"), col(payloadCol).as("p"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val (sig, n, err) = clipSignatureLenient(bytes)
        (id, sig, n, err)
      }
      .toDF("doc_id", "simhash", "n_frames", "decode_error")
  }

  /** LENIENT video near-dup: [[videoNearDupPairs]] over a corpus that may
    * contain corrupt payloads — undecodable clips drop out of the banding
    * (they have no signature), everything else pairs normally, and no
    * corrupt sample can fail the job.
    */
  def videoNearDupPairsLenient(
      assets: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int, bands: Int = 8): DataFrame =
    graft.text.Dedup.simhashPairs(
      signedOnce(clipSignaturesLenient(assets, idCol, payloadCol)
        .where(col("simhash").isNotNull)
        .select(col("doc_id"), col("simhash"))),
      maxHamming, bands = bands, bits = 64)

  /** LENIENT distributed image decode: the corrupt-corpus form of
    * [[decodeImageFeatures]] — a malformed payload yields a row with null
    * features and the parse error in `decode_error` instead of failing
    * the task. At 100 TB a handful of corrupt samples per billion is the
    * norm; strict decode would kill the whole job on the first one, and a
    * silent drop would hide the corruption rate. Callers filter on
    * `decode_error IS NULL` and audit the rest.
    */
  /** Null payloads and ANY decode failure become error rows — a corrupt
    * corpus contains null cells as often as garbled bytes, and the
    * contract is "never a task failure", so the net is NonFatal-wide.
    */
  private def leniently[T](bytes: Array[Byte])(decode: Array[Byte] => T)
      : (Option[T], String) =
    if (bytes == null) (None, "null payload")
    else
      try (Some(decode(bytes)), null)
      catch { case scala.util.control.NonFatal(e) => (None, errorLabel(e)) }

  /** Never-null error label: a message-less exception would otherwise
    * produce a row with null features AND null `decode_error`, which the
    * `decode_error IS NULL` clean-row contract would misread as clean.
    */
  private def errorLabel(e: Throwable): String =
    Option(e.getMessage).getOrElse(e.getClass.getSimpleName)

  /** Public lenient wrapper for single-signature extraction (the
    * streaming image/audio lenient twins): (Some(sig), None) on success,
    * (None, Some(label)) on null payload or any decode failure — the
    * [[leniently]] contract with the never-null error exposed as Option.
    */
  def signatureLeniently(bytes: Array[Byte])(
      f: Array[Byte] => Long): (Option[Long], Option[String]) = {
    val (v, err) = leniently(bytes)(f)
    (v, Option(err))
  }

  def decodeImageFeaturesLenient(
      assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      leniently(bytes)(b => imageFeats(decodePpm(b)))
    }
    assets
      .select(col(idCol).as("asset_id"), f(col(payloadCol)).as("f"))
      .select(col("asset_id"),
        col("f._1._1").as("width"), col("f._1._2").as("height"),
        col("f._1._3").as("mean_r"), col("f._1._4").as("mean_g"),
        col("f._1._5").as("mean_b"), col("f._1._6").as("phash"),
        col("f._2").as("decode_error"))
  }

  /** LENIENT distributed audio decode — same contract as
    * [[decodeImageFeaturesLenient]]: null features + `decode_error` on a
    * malformed payload, never a task failure.
    */
  def decodeAudioFeaturesLenient(
      assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val f = udf { (bytes: Array[Byte]) =>
      leniently(bytes)(b => audioFeats(decodeWavPcm8(b)))
    }
    assets
      .select(col(idCol).as("asset_id"), f(col(payloadCol)).as("f"))
      .select(col("asset_id"),
        col("f._1._1").as("sample_rate"), col("f._1._2").as("n_samples"),
        col("f._1._3").as("mean_amp"), col("f._1._4").as("peak"),
        col("f._1._5").as("rms_sq"), col("f._1._6").as("crossings"),
        col("f._2").as("decode_error"))
  }

  /** LENIENT multi-frame walk: frames decoded BEFORE the first malformed
    * byte are kept (a truncated tail — the common corruption — loses only
    * the tail), with the error that stopped the walk. `(frames, None)` on
    * a clean stream.
    */
  def decodeFramesLenient(
      bytes: Array[Byte],
      maxFrames: Int = 100000): (Seq[DecodedImage], Option[String]) = {
    if (bytes == null) return (Nil, Some("null payload"))
    val out = Vector.newBuilder[DecodedImage]
    var pos = 0
    var n = 0
    while (pos < bytes.length) {
      if (n >= maxFrames)
        return (out.result(), Some(s"more than $maxFrames frames"))
      try {
        val (img, next) = decodePpmAt(bytes, pos)
        out += img
        pos = next
        n += 1
      } catch {
        case scala.util.control.NonFatal(e) =>
          return (out.result(), Some(errorLabel(e)))
      }
    }
    (out.result(), None)
  }

  /** LENIENT distributed video decode: per-frame rows for every frame
    * that decoded (prefix semantics of [[decodeFramesLenient]]), plus —
    * only when the walk stopped early — one trailing row with null frame
    * fields carrying `decode_error`. A clean corpus is byte-identical to
    * [[decodeVideoFrames]] plus an all-null error column.
    */
  def decodeVideoFramesLenient(
      assets: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets
      .select(col(idCol).cast("long").as("asset_id"), col(payloadCol).as("p"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val (frames, err) = decodeFramesLenient(bytes)
        val good = frames.iterator.zipWithIndex.map { case (img, i) =>
          (id, Some(i), Some(img.width), Some(img.height),
            Some(imageAHash(img)), None: Option[String])
        }
        good ++ err.iterator.map(m =>
          (id, None: Option[Int], None: Option[Int], None: Option[Int],
            None: Option[Long], Some(m)))
      }
      .toDF("asset_id", "frame_idx", "width", "height", "frame_phash",
        "decode_error")
  }

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

  // The r8-era stub tier (frameSample / phash / payloadStats — synthetic
  // frame fingerprints over the TEXT column) was retired in r10: the real
  // decode tier above (decodePpm/decodeWavPcm8/decodeFrames/sampleFrames +
  // imageAHash/clipSignature) proves the same Spark-side plumbing on
  // actual byte walks, and its gate queries (mm_image_decode,
  // mm_video_sample, mm_image_neardup, …) carry full hash oracles.
}
