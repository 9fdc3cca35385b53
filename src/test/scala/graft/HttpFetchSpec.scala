package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll

import graft.stages._

/** HttpFetchStage against an in-process HTTP server: the four reference
  * paths — success, terminal 404, retry-on-5xx, and HTML masquerading as
  * an image (the F3 content-type filter) — plus referer derivation and
  * timeout-as-transient.
  */
class HttpFetchSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val flakyHits = new AtomicInteger(0)
  private val seenReferers = new ConcurrentHashMap[String, String]()
  private val seenAgents = new ConcurrentHashMap[String, String]()

  private def respond(ex: HttpExchange, status: Int, ct: String,
      body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", ct)
    ex.sendResponseHeaders(status, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      seenReferers.put(path, Option(ex.getRequestHeaders.getFirst("Referer")).getOrElse(""))
      seenAgents.put(path, Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse(""))
      path match {
        case "/page" =>
          respond(ex, 200, "text/html", "<html>hello</html>".getBytes(UTF_8))
        case "/img.jpg" =>
          respond(ex, 200, "image/jpeg", Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 7, 7))
        case "/missing.jpg" =>
          respond(ex, 404, "text/plain", "gone".getBytes(UTF_8))
        case "/flaky.jpg" =>
          if (flakyHits.incrementAndGet() <= 2)
            respond(ex, 503, "text/plain", "busy".getBytes(UTF_8))
          else
            respond(ex, 200, "image/jpeg", Array[Byte](0xFF.toByte, 0xD8.toByte, 1))
        case "/blocked.jpg" =>
          // CDN block page: image content type, HTML body.
          respond(ex, 200, "image/jpeg",
            "<!DOCTYPE html><html>blocked</html>".getBytes(UTF_8))
        case "/json.jpg" =>
          respond(ex, 200, "application/json", "{}".getBytes(UTF_8))
        case "/huge.jpg" =>
          val big = Array.fill[Byte](64 * 1024)(0x42)
          big(0) = 0xFF.toByte; big(1) = 0xD8.toByte
          respond(ex, 200, "image/jpeg", big)
        case "/barely-huge.jpg" =>
          // Just over a 1024 cap and small enough to arrive in one read:
          // the EOF lands right after the over-cap write.
          respond(ex, 200, "image/jpeg", Array.fill[Byte](1500)(0x42))
        case "/slow" =>
          Thread.sleep(500)
          respond(ex, 200, "text/html", "late".getBytes(UTF_8))
        case _ =>
          respond(ex, 404, "text/plain", Array.emptyByteArray)
      }
    })
    server.setExecutor(null)
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
    super.beforeAll()
  }

  override def afterAll(): Unit = {
    try server.stop(0) finally super.afterAll()
  }

  private def fetchOne(stage: InferenceStage[FetchRequest, Attempted[FetchResult]],
      req: FetchRequest): Attempted[FetchResult] = {
    import spark.implicits._
    stage.run(Seq(req).toDS()).collect().head
  }

  test("page fetch succeeds and carries the body through as a row") {
    import spark.implicits._
    val stage = HttpFetchStage.withRetry(timeoutMs = 2000, baseBackoffMs = 0L)
    val reqs = Seq(FetchRequest(1L, s"$base/page"), FetchRequest(2L, s"$base/img.jpg"))
    val out = stage.run(reqs.toDS().repartition(2)).collect()
      .map(a => a.value.get.id -> a).toMap
    assert(out(1L).succeeded && out(1L).attempts == 1)
    assert(new String(out(1L).value.get.body, UTF_8) == "<html>hello</html>")
    assert(out(2L).value.get.status == 200)
  }

  test("404 is terminal: a failed row on the first attempt, never retried") {
    val a = fetchOne(HttpFetchStage.withRetry(timeoutMs = 2000, baseBackoffMs = 0L),
      FetchRequest(3L, s"$base/missing.jpg"))
    assert(a.succeeded && a.attempts == 1)
    val r = a.value.get
    assert(!r.ok && r.status == 404 && r.error == "HTTP 404")
  }

  test("5xx is transient: backoff retry until the server recovers") {
    flakyHits.set(0)
    val a = fetchOne(
      HttpFetchStage.withRetry(timeoutMs = 2000, expectImage = true,
        maxAttempts = 3, baseBackoffMs = 0L),
      FetchRequest(4L, s"$base/flaky.jpg"))
    assert(a.succeeded && a.attempts == 3, a)
    assert(a.value.get.ok && a.value.get.status == 200)
  }

  test("image mode rejects HTML masquerade and non-image content types terminally") {
    val stage = HttpFetchStage.withRetry(timeoutMs = 2000, expectImage = true,
      baseBackoffMs = 0L)
    val blocked = fetchOne(stage, FetchRequest(5L, s"$base/blocked.jpg"))
    assert(blocked.attempts == 1)
    assert(blocked.value.get.error == "html_masquerade")
    val json = fetchOne(stage, FetchRequest(6L, s"$base/json.jpg"))
    assert(json.value.get.error.startsWith("not_an_image"))
    // A page fetch (expectImage = false) of the same HTML body is fine.
    val page = fetchOne(HttpFetchStage.withRetry(timeoutMs = 2000, baseBackoffMs = 0L),
      FetchRequest(7L, s"$base/blocked.jpg"))
    assert(page.value.get.ok)
  }

  test("oversize body is a terminal failed row, not silently truncated bytes") {
    val a = fetchOne(
      HttpFetchStage.withRetry(timeoutMs = 2000, expectImage = true,
        baseBackoffMs = 0L, maxBytes = 1024),
      FetchRequest(11L, s"$base/huge.jpg"))
    assert(a.succeeded && a.attempts == 1)
    val r = a.value.get
    assert(!r.ok && r.error.startsWith("too_large"), r.error)
    assert(r.body.isEmpty)
    // Boundary: over the cap but delivered in one read before EOF — must
    // still be rejected, not slip through because the loop saw EOF next.
    val b = fetchOne(
      HttpFetchStage.withRetry(timeoutMs = 2000, expectImage = true,
        baseBackoffMs = 0L, maxBytes = 1024),
      FetchRequest(12L, s"$base/barely-huge.jpg"))
    assert(b.value.get.error.startsWith("too_large"), b.value.get.error)
  }

  test("read timeout is transient and exhausts into a failed row") {
    val a = fetchOne(
      HttpFetchStage.withRetry(timeoutMs = 100, maxAttempts = 2, baseBackoffMs = 0L),
      FetchRequest(8L, s"$base/slow"))
    assert(!a.succeeded && a.attempts == 2)
    assert(a.lastError.toLowerCase.contains("timeout"), a.lastError)
  }

  test("referer defaults to the target origin and explicit referers pass through") {
    val stage = HttpFetchStage.withRetry(timeoutMs = 2000, baseBackoffMs = 0L)
    fetchOne(stage, FetchRequest(9L, s"$base/img.jpg"))
    assert(seenReferers.get("/img.jpg") == s"$base/")
    // The browser-style agent goes out by default — never the JDK's
    // "Java/…", which CDNs block on sight.
    assert(seenAgents.get("/img.jpg") == HttpFetchStage.defaultUserAgent)
    fetchOne(stage, FetchRequest(10L, s"$base/page", referer = "https://example.com/"))
    assert(seenReferers.get("/page") == "https://example.com/")
  }
}
