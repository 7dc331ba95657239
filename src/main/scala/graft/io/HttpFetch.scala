package graft.io

import java.io.InputStream
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6 live-fetch connector: distributed download-into-cache with the
  * reference's retry/escalation protocol (reference
  * `src/utils/data_download_util.py:43-78`: MAX_DOWNLOAD_RETRY_TIME = 3
  * attempts, size hint starting at 100 MB and escalating +100 MB, timeout
  * starting 60 s escalating +300 s, success = at least 10 lines written;
  * `src/experiment_config.py:28`: failed keys requeued for up to 100
  * sweeps; `src/analysis/ecocyc_analysis.py:231-246`: cache-file existence
  * short-circuits the fetch, gzip bodies are decompressed).
  *
  * DEFAULT OFF ([[FetchConfig.enabled]] = false → cache-probe only, no
  * network). The connector never participates in the correctness surface:
  * queries read the materialized cache tables; this stage only POPULATES
  * the cache, exactly like the reference's download-then-analyze split.
  *
  * Scale shape: keys fan out over `foreachPartition`-style tasks (here
  * `mapPartitions`, so each key reports a status row); each task fetches
  * its partition's keys serially against the remote — cluster-wide
  * parallelism is the partition count, the natural politeness throttle.
  * Writes are idempotent (existence check + tmp-file + atomic rename), so
  * task retries and speculative duplicates are safe. Only FAILED keys are
  * collected for the requeue loop — the failure list is by construction
  * the small side, never the corpus.
  *
  * Driver-boundedness: the key list is ENTITY ids (the reference's
  * EcoCyc/KEGG/NCBI page caches — 10³–10⁵ keys), never corpus rows; the
  * per-sweep status collect is one ~100-byte row per queued key, and
  * sweeps after the first carry failures only. A corpus-scale fetch (one
  * URL per document) is a different operator — it would stream statuses
  * to a table instead of returning them.
  */
object HttpFetch {

  /** Knobs default to the reference's constants. */
  case class FetchConfig(
      enabled: Boolean = false,
      maxRetries: Int = 3,
      initialTimeoutMs: Int = 60000,
      timeoutEscalationMs: Int = 300000,
      initialSizeHint: Long = 100L * 1000 * 1000,
      sizeHintEscalation: Long = 100L * 1000 * 1000,
      minLines: Int = 10,
      maxIterations: Int = 100)

  /** Fetch status for one key (one row per key per [[fetchToCache]] call). */
  case class FetchStatus(
      key: String, url: String, cached: Boolean, fetched: Boolean,
      ok: Boolean, attempts: Int, bytes: Long, lines: Int)

  /** Default transport: HTTP GET with a per-attempt timeout and a
    * size-hint substituted into `%d` if the URL carries one (the
    * reference's escalating `download_size` query parameter); gzip
    * Content-Encoding is decompressed, mirroring
    * `ecocyc_analysis.py:264-268`.
    */
  def httpGet(url: String, timeoutMs: Int, sizeHint: Long): Array[Byte] = {
    // literal token replacement, NOT String.format: format() would
    // re-interpret every other '%' sequence, so a percent-encoded URL
    // (e.g. containing %2F) with a size-hint slot would throw per attempt
    val expanded = url.replace("%d", sizeHint.toString)
    val conn = new URI(expanded).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    try {
      val raw = conn.getInputStream
      val in: InputStream =
        if ("gzip".equalsIgnoreCase(conn.getContentEncoding)) new GZIPInputStream(raw)
        else raw
      try in.readAllBytes() finally in.close()
    } finally conn.disconnect()
  }

  /** Cache file name for a key: characters outside [A-Za-z0-9._-] map to
    * '_' and the dot-only names collapse to '_' — a key containing '/'
    * (or '..') can neither escape `cacheDir` nor break tmp-file creation.
    * Distinct keys that sanitize to the same name share a cache file;
    * callers with adversarial key spaces should pre-hash their keys.
    */
  private[io] def cacheFileName(key: String): String = {
    val s = key.map { c =>
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '-') c
      else '_'
    }
    if (s.isEmpty || s == "." || s == "..") "_" else s
  }

  private def countLines(body: Array[Byte]): Int = {
    var n = 0; var i = 0
    while (i < body.length) { if (body(i) == '\n') n += 1; i += 1 }
    if (body.nonEmpty && body(body.length - 1) != '\n') n + 1 else n
  }

  /** Fetch one key with the reference's retry/escalation ladder; assumes
    * the cache miss was already established. Returns the status row.
    */
  private def fetchOne(
      key: String, url: String, cacheDir: String, cfg: FetchConfig,
      transport: (String, Int, Long) => Array[Byte]): FetchStatus = {
    val fileName = cacheFileName(key)
    val target = Paths.get(cacheDir, fileName)
    var attempt = 0
    var timeoutMs = cfg.initialTimeoutMs
    var sizeHint = cfg.initialSizeHint
    var done: FetchStatus = null
    while (done == null && attempt < cfg.maxRetries) {
      attempt += 1
      try {
        val body = transport(url, timeoutMs, sizeHint)
        val lines = countLines(body)
        if (lines >= cfg.minLines) {
          // tmp + atomic rename: concurrent/speculative writers converge
          // on one complete file, never a torn one
          val tmp = Files.createTempFile(target.getParent, s".${fileName}_", ".part")
          Files.write(tmp, body)
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          done = FetchStatus(key, url, cached = false, fetched = true,
            ok = true, attempts = attempt, bytes = body.length.toLong, lines = lines)
        } else {
          // the reference's "suspiciously short body" escalation:
          // +100 MB size hint, +300 s timeout, retry
          sizeHint += cfg.sizeHintEscalation
          timeoutMs += cfg.timeoutEscalationMs
        }
      } catch {
        case _: Exception =>
          sizeHint += cfg.sizeHintEscalation
          timeoutMs += cfg.timeoutEscalationMs
      }
    }
    if (done != null) done
    else FetchStatus(key, url, cached = false, fetched = true, ok = false,
      attempts = attempt, bytes = 0L, lines = 0)
  }

  /** Ensure every (key, url) is present in `cacheDir`: cache hits
    * short-circuit; with `cfg.enabled` misses are fetched with retry +
    * escalation, and still-failing keys are requeued for up to
    * `cfg.maxIterations` sweeps; with the connector disabled (default)
    * misses are only REPORTED (`ok = false, fetched = false`). Returns one
    * status row per key from the LAST sweep that touched it.
    *
    * `transport` is injectable for tests (local HTTP stubs) and for
    * alternative protocols; it must be serializable (runs in tasks).
    */
  def fetchToCache(
      spark: SparkSession,
      keys: Seq[(String, String)],
      cacheDir: String,
      cfg: FetchConfig = FetchConfig(),
      transport: (String, Int, Long) => Array[Byte] = httpGet): DataFrame = {
    import spark.implicits._
    Files.createDirectories(Paths.get(cacheDir))
    val result = scala.collection.mutable.Map.empty[String, FetchStatus]
    var queue = keys
    var sweep = 0
    while (queue.nonEmpty && sweep < cfg.maxIterations) {
      sweep += 1
      val statuses = spark.sparkContext.parallelize(queue, math.min(queue.size, 32).max(1))
        .mapPartitions { it =>
          it.map { case (key, url) =>
            val cachePath = Paths.get(cacheDir, cacheFileName(key))
            if (Files.exists(cachePath))
              FetchStatus(key, url, cached = true, fetched = false, ok = true,
                attempts = 0, bytes = Files.size(cachePath),
                lines = 0)
            else if (!cfg.enabled)
              FetchStatus(key, url, cached = false, fetched = false, ok = false,
                attempts = 0, bytes = 0L, lines = 0)
            else fetchOne(key, url, cacheDir, cfg, transport)
          }
        }.collect()
      statuses.foreach(s => result(s.key) = s)
      // only failures requeue — and only while the connector may fetch
      queue =
        if (!cfg.enabled) Seq.empty
        else queue.filter { case (k, _) => !result(k).ok }
    }
    result.values.toSeq.sortBy(_.key).toDF()
  }
}
