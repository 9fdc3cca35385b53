package graft.stages

import java.io.{ByteArrayOutputStream, InputStream}
import java.net.{HttpURLConnection, SocketTimeoutException, URI}

/** One fetch: an id carried through to the result, the URL, and an
  * optional explicit referer. Empty referer → derived from the URL's own
  * scheme + authority (reference any_scraper.py:283-287 builds exactly
  * this "main site as referer, not the CDN domain" header to pass CDN
  * hotlink checks).
  */
final case class FetchRequest(id: Long, url: String, referer: String = "")

/** Fetch outcome as a row, never an exception: terminal failures (4xx,
  * masquerade, undecodable) are data the pipeline aggregates (A5-style
  * success/failure accounting), not job failures.
  */
final case class FetchResult(id: Long, url: String, status: Int,
    contentType: String, body: Array[Byte], error: String) {
  def ok: Boolean = error.isEmpty
}

/** Transient HTTP failure — 5xx or a network timeout. Thrown (rather than
  * returned) so [[RetryStage]] composed around this stage applies its
  * exponential backoff and re-attempts; everything else is terminal and
  * comes back as a [[FetchResult]] row on the first try.
  */
final class TransientHttpException(msg: String) extends RuntimeException(msg)

/** Real HTTP source stage (reference S6 page fetch at
  * /root/reference/data_pipeline/scrapers/any_scraper.py:118-159, S7 image
  * download + validation at :267-330), on JDK HttpURLConnection so it adds
  * no dependency.
  *
  * Semantics mirrored from the reference:
  *  - per-request timeout (connect + read), `requests.get(..., timeout=)`;
  *  - Referer header derived from the target's own origin unless given;
  *  - non-200 → failed row with the status (`HTTP {code}`);
  *  - `expectImage`: reject text/html / application/json content types
  *    ("Not an image", :301-303) and bodies that are HTML masquerading as
  *    an image — first bytes `<` or a `<!DOCTYPE` marker ("Received HTML
  *    instead of image (blocked by CDN)", :305-307) — the F3 filter;
  *  - 5xx and timeouts throw [[TransientHttpException]] for the retry
  *    wrapper; compose via [[HttpFetchStage.withRetry]].
  *
  * Scale shape: one connection-reusing handle per partition (per executor
  * core), rows streamed lazily — fetch concurrency is governed by Spark
  * parallelism, and politeness by composing [[RateLimitedStage]], exactly
  * like every other stage.
  */
class HttpFetchStage(timeoutMs: Int = 15000, expectImage: Boolean = false,
    maxBytes: Int = 32 * 1024 * 1024,
    userAgent: String = HttpFetchStage.defaultUserAgent)
    extends InferenceStage[FetchRequest, FetchResult] {

  def setup(): ModelHandle[FetchRequest, FetchResult] =
    new ModelHandle[FetchRequest, FetchResult] {
      def infer(in: FetchRequest): FetchResult = {
        val uri = URI.create(in.url)
        val referer =
          if (in.referer.nonEmpty) in.referer
          else s"${uri.getScheme}://${uri.getAuthority}/"
        val conn = uri.toURL.openConnection().asInstanceOf[HttpURLConnection]
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        conn.setRequestProperty("Referer", referer)
        // CDNs block the JDK's default "Java/…" agent outright; the
        // reference sends a browser agent on every request
        // (test_scraper_requests.py:26, any_scraper.py headers).
        if (userAgent.nonEmpty) conn.setRequestProperty("User-Agent", userAgent)
        conn.setRequestProperty("Accept",
          if (expectImage) "image/avif,image/webp,image/apng,image/*,*/*;q=0.8"
          else "*/*")
        try {
          val status =
            try conn.getResponseCode
            catch {
              case e: SocketTimeoutException =>
                throw new TransientHttpException(s"timeout: ${e.getMessage}")
              case e: java.io.IOException =>
                throw new TransientHttpException(
                  s"${e.getClass.getSimpleName}: ${e.getMessage}")
            }
          if (status >= 500)
            throw new TransientHttpException(s"HTTP $status")
          val ct = Option(conn.getContentType).getOrElse("")
          if (status != 200)
            FetchResult(in.id, in.url, status, ct, Array.emptyByteArray,
              s"HTTP $status")
          else {
            val (body, truncated) =
              try readAll(conn.getInputStream)
              catch {
                case e: SocketTimeoutException =>
                  throw new TransientHttpException(s"timeout: ${e.getMessage}")
              }
            if (truncated)
              // Terminal, and the truncated bytes are dropped: a partial
              // body that kept flowing would be a corrupt image/page
              // indistinguishable from a good one downstream.
              FetchResult(in.id, in.url, status, ct, Array.emptyByteArray,
                s"too_large: body exceeds $maxBytes bytes")
            else if (expectImage &&
                (ct.contains("text/html") || ct.contains("application/json")))
              FetchResult(in.id, in.url, status, ct, body, s"not_an_image: $ct")
            else if (expectImage && looksLikeHtml(body))
              FetchResult(in.id, in.url, status, ct, body, "html_masquerade")
            else
              FetchResult(in.id, in.url, status, ct, body, "")
          }
        } finally conn.disconnect()
      }
    }

  /** Read the full body, or stop once it exceeds [[maxBytes]]. Second
    * element is true iff the body exceeded maxBytes — whether the cap
    * tripped mid-stream (loop exits with n >= 0) or the over-cap bytes
    * arrived in the final read before EOF (n == -1 but size is over).
    */
  private def readAll(is: InputStream): (Array[Byte], Boolean) = {
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = is.read(buf)
    while (n >= 0 && out.size() <= maxBytes) {
      out.write(buf, 0, n)
      n = is.read(buf)
    }
    is.close()
    (out.toByteArray, n >= 0 || out.size() > maxBytes)
  }

  /** Reference masquerade check (any_scraper.py:305-307): the first 100
    * bytes, whitespace-trimmed, start with '<', or contain a DOCTYPE
    * marker anywhere in that window.
    */
  private def looksLikeHtml(body: Array[Byte]): Boolean = {
    val head = body.take(100)
    val trimmed = head.dropWhile(b => b == ' ' || b == '\n' || b == '\r' || b == '\t')
    trimmed.headOption.contains('<'.toByte) ||
      new String(head, java.nio.charset.StandardCharsets.ISO_8859_1)
        .contains("<!DOCTYPE")
  }
}

object HttpFetchStage {

  /** Browser-style agent mirroring the reference's request headers; pass
    * userAgent = "" to fall back to the JDK default.
    */
  val defaultUserAgent: String =
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 " +
      "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"

  /** The production composition: fetch wrapped in exponential-backoff
    * retry — transient rows (5xx, timeout) re-attempt with 1s/2s/4s waits
    * (reference test_kimono.py:87-99), terminal ones pass straight
    * through as failed rows with `attempts = 1`.
    */
  def withRetry(timeoutMs: Int = 15000, expectImage: Boolean = false,
      maxAttempts: Int = 3, baseBackoffMs: Long = 1000L,
      maxBytes: Int = 32 * 1024 * 1024,
      userAgent: String = defaultUserAgent)
      : InferenceStage[FetchRequest, Attempted[FetchResult]] =
    RetryStage.wrap(
      new HttpFetchStage(timeoutMs, expectImage, maxBytes, userAgent),
      maxAttempts, baseBackoffMs)
}
