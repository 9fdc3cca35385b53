package graft

import org.apache.spark.sql.functions._
import graft.stages._

/** Compile-checked seam contract for the opt-in Selenium adapter (r11
  * ADVICE): the default build never type-checks
  * `src/optional/selenium/.../SeleniumRenderer.scala` (it needs the
  * selenium jars the zero-egress build doesn't have), so a PageRenderer
  * seam change could silently break the adapter for the deployments
  * that DO opt in. [[StubBrowserRenderer]] mirrors the adapter's seam
  * usage member for member — constructor shape, `open()` returning a
  * `PageRenderer.Session`, try/catch in `render` mapping driver
  * timeouts to [[TransientHttpException]], `close()` overridden to quit
  * the browser — with the WebDriver calls swapped for an in-process
  * fake. Any seam change that would break SeleniumRenderer's
  * compilation breaks this file in every default `sbt test` run.
  * Keep in sync with SeleniumRenderer when either changes.
  */
final class StubBrowserRenderer(extraArgs: Seq[String] = Nil,
    pageLoadTimeoutSec: Long = 30) extends PageRenderer {

  /** Stands in for ChromeDriver: same call shape the adapter uses. */
  private final class FakeDriver(args: Seq[String]) {
    def get(url: String): Unit =
      if (url.contains("timeout")) throw new FakeTimeoutException
    def getPageSource: String =
      s"<html><body>rendered with ${args.size} args</body></html>"
    def quit(): Unit = ()
  }
  private final class FakeTimeoutException extends RuntimeException("timeout")

  def open(): PageRenderer.Session = {
    val args = Seq("--headless=new", "--disable-gpu", "--no-sandbox") ++
      extraArgs
    val driver = new FakeDriver(args)
    new PageRenderer.Session {
      def render(url: String): String =
        try {
          driver.get(url)
          driver.getPageSource
        } catch {
          case _: FakeTimeoutException =>
            throw new TransientHttpException(s"render timeout: $url")
        }
      override def close(): Unit = driver.quit()
    }
  }
}

class SeleniumSeamSpec extends SparkSpec {

  test("adapter-shaped renderer drives the rendered-fetch stage through the seam") {
    import spark.implicits._
    // The stub flows through the SAME production path the Selenium
    // adapter would: RenderedFetchStage.setup() opens one session per
    // partition, rows render through it, transient failures compose
    // with RetryStage, and the session closes when the partition drains.
    val renderer = new StubBrowserRenderer(extraArgs = Seq("--lang=en"))
    val out = new RenderedFetchStage(renderer)
      .run(Seq(FetchRequest(1L, "http://x.example.com/ok")).toDS()
        .repartition(1))
      .collect()
    assert(out.length == 1 && out.head.ok)
    assert(out.head.html.contains("rendered with 4 args"))

    // The retry contract: a timeout surfaces as TransientHttpException
    // and RetryStage exhausts attempts into a failure ROW, not a crash.
    val retried = RetryStage.wrap(new RenderedFetchStage(renderer),
        maxAttempts = 2, baseBackoffMs = 1L)
      .run(Seq(FetchRequest(2L, "http://x.example.com/timeout")).toDS()
        .repartition(1))
      .collect()
    assert(retried.length == 1)
    assert(retried.head.attempts == 2 && retried.head.value.isEmpty)
  }
}
