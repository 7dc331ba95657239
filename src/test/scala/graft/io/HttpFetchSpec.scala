package graft.io

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger
import java.util.zip.GZIPOutputStream

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.io.HttpFetch.{FetchConfig, FetchStatus}

/** Integration test of the live S6 connector against a LOCAL http stub
  * (the build environment has no egress; the stub runs in this JVM and is
  * reachable from local-mode executors).
  */
class HttpFetchSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  private val okHits = new AtomicInteger(0)
  private val flakyHits = new AtomicInteger(0)

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte],
      gzip: Boolean = false): Unit = {
    val out = if (gzip) {
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new GZIPOutputStream(bos)
      gz.write(body); gz.close()
      ex.getResponseHeaders.set("Content-Encoding", "gzip")
      bos.toByteArray
    } else body
    ex.sendResponseHeaders(code, out.length)
    ex.getResponseBody.write(out)
    ex.close()
  }

  private def lines(n: Int): Array[Byte] =
    (1 to n).map(i => s"line $i").mkString("\n").getBytes(StandardCharsets.UTF_8)

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/ok", (ex: HttpExchange) => {
      okHits.incrementAndGet()
      respond(ex, 200, lines(12))
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      // two short bodies, then a good one — exercises the escalation ladder
      if (flakyHits.incrementAndGet() <= 2) respond(ex, 200, lines(3))
      else respond(ex, 200, lines(15))
    })
    server.createContext("/short", (ex: HttpExchange) => respond(ex, 200, lines(2)))
    server.createContext("/gzip", (ex: HttpExchange) =>
      respond(ex, 200, lines(11), gzip = true))
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    server.stop(0)
    super.afterAll()
  }

  private def url(path: String) = s"http://127.0.0.1:$port$path"

  private def freshDir(): String =
    Files.createTempDirectory("httpfetch").toString

  private def statuses(df: org.apache.spark.sql.DataFrame): Map[String, FetchStatus] = {
    import df.sparkSession.implicits._
    df.as[FetchStatus].collect().map(s => s.key -> s).toMap
  }

  test("disabled connector probes the cache and never fetches") {
    val dir = freshDir()
    Files.write(Paths.get(dir, "have"), lines(12))
    val before = okHits.get()
    val st = statuses(HttpFetch.fetchToCache(spark,
      Seq("have" -> url("/ok/a"), "miss" -> url("/ok/b")), dir))
    assert(okHits.get() == before, "disabled connector must not touch the network")
    assert(st("have").cached && st("have").ok && !st("have").fetched)
    assert(!st("miss").ok && !st("miss").fetched)
  }

  test("enabled connector fetches misses, skips hits, is idempotent") {
    val dir = freshDir()
    val cfg = FetchConfig(enabled = true, initialTimeoutMs = 2000,
      timeoutEscalationMs = 0)
    val st = statuses(HttpFetch.fetchToCache(spark,
      Seq("a" -> url("/ok/a"), "b" -> url("/gzip/b")), dir, cfg))
    assert(st("a").ok && st("a").fetched && st("a").attempts == 1)
    assert(st("b").ok, "gzip body must decompress and count its lines")
    assert(Files.readAllLines(Paths.get(dir, "a")).size == 12)
    assert(Files.readAllLines(Paths.get(dir, "b")).size == 11)
    // second call: all cache hits, zero network traffic
    val before = okHits.get()
    val st2 = statuses(HttpFetch.fetchToCache(spark,
      Seq("a" -> url("/ok/a"), "b" -> url("/gzip/b")), dir, cfg))
    assert(okHits.get() == before)
    assert(st2("a").cached && st2("b").cached)
  }

  test("short bodies escalate and retry (reference ladder), then succeed") {
    val dir = freshDir()
    flakyHits.set(0)
    val cfg = FetchConfig(enabled = true, initialTimeoutMs = 2000,
      timeoutEscalationMs = 0)
    val st = statuses(HttpFetch.fetchToCache(spark,
      Seq("f" -> url("/flaky/f")), dir, cfg))
    assert(st("f").ok && st("f").attempts == 3,
      s"expected success on the 3rd attempt, got ${st("f")}")
    assert(Files.readAllLines(Paths.get(dir, "f")).size == 15)
  }

  test("persistently-short bodies fail after retries and bounded requeues") {
    val dir = freshDir()
    val cfg = FetchConfig(enabled = true, initialTimeoutMs = 2000,
      timeoutEscalationMs = 0, maxIterations = 4)
    val st = statuses(HttpFetch.fetchToCache(spark,
      Seq("s" -> url("/short/s"), "a" -> url("/ok/a")), dir, cfg))
    assert(!st("s").ok && st("s").attempts == 3)
    assert(st("a").ok, "one bad key must not poison the batch")
    assert(!Files.exists(Paths.get(dir, "s")), "failed fetch must not write the cache file")
  }

  test("path-hostile keys sanitize into cacheDir; %-encoded urls with %d slots expand safely") {
    val dir = freshDir()
    val cfg = FetchConfig(enabled = true, initialTimeoutMs = 2000,
      timeoutEscalationMs = 0)
    // '/' and '..' in keys must not escape cacheDir or break tmp creation;
    // the %2F in the url must survive the literal %d substitution (format()
    // would throw UnknownFormatConversionException on it)
    val st = statuses(HttpFetch.fetchToCache(spark,
      Seq("../evil/key" -> url("/ok/x?p=a%2Fb&size=%d")), dir, cfg))
    assert(st("../evil/key").ok, st("../evil/key").toString)
    assert(Files.exists(Paths.get(dir, ".._evil_key")))
    assert(!Files.exists(Paths.get(dir).getParent.resolve("evil")),
      "sanitized key must stay inside cacheDir")
    // second sweep: the sanitized name is what the cache probe checks
    val st2 = statuses(HttpFetch.fetchToCache(spark,
      Seq("../evil/key" -> url("/ok/x")), dir, cfg))
    assert(st2("../evil/key").cached)
    assert(HttpFetch.cacheFileName("..") == "_")
    assert(HttpFetch.cacheFileName("") == "_")
  }

  test("unreachable host exhausts retries without throwing") {
    val dir = freshDir()
    val cfg = FetchConfig(enabled = true, initialTimeoutMs = 200,
      timeoutEscalationMs = 0, maxIterations = 2)
    val st = statuses(HttpFetch.fetchToCache(spark,
      Seq("x" -> "http://127.0.0.1:1/never"), dir, cfg))
    assert(!st("x").ok && st("x").attempts == 3)
  }
}
