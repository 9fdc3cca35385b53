package graft.stages

import org.openqa.selenium.chrome.{ChromeDriver, ChromeOptions}

/** Headless-Chrome [[PageRenderer]] — the deployment adapter SCALE.md
  * specifies for the reference's Selenium deep crawl
  * (/root/reference/data_pipeline/scrapers/robust_scraper.py:137-189).
  *
  * NOT compiled by default: this source set is included only with
  * `-Dgraft.selenium=true` plus selenium-java jars on the classpath via
  * `-Dgraft.selenium.jars=<dir>` (see build.sbt). The zero-egress build
  * environment has neither the dependency nor a browser, so the in-repo
  * test stand-in remains [[FixtureRenderer]]; this file keeps the adapter
  * honest — it must keep compiling against the seam whenever a deployment
  * DOES ship Selenium.
  *
  * Lifecycle matches the seam contract: `open()` pays the Chrome launch
  * once per partition (inside [[RenderedFetchStage.setup]], one driver
  * per executor core — budget executor memory for ~300 MB per Chrome);
  * `render` navigates and returns the final DOM; `close()` quits the
  * browser when the partition drains. Timeouts and connection-level
  * navigation failures surface as [[TransientHttpException]] so
  * [[RetryStage]] composes; anything else (bad URL, crashed tab) is a
  * terminal per-row failure, exactly like [[FixtureRenderer]]'s unknown
  * fixture.
  */
final class SeleniumRenderer(extraArgs: Seq[String] = Nil,
    pageLoadTimeoutSec: Long = 30) extends PageRenderer {

  def open(): PageRenderer.Session = {
    val opts = new ChromeOptions()
    // The flags SCALE.md pins for executor images: new headless mode, no
    // GPU, and no sandbox (containers run Chrome as root).
    val args = Seq("--headless=new", "--disable-gpu", "--no-sandbox") ++
      extraArgs
    opts.addArguments(args: _*)
    val driver = new ChromeDriver(opts)
    driver.manage().timeouts()
      .pageLoadTimeout(java.time.Duration.ofSeconds(pageLoadTimeoutSec))
    new PageRenderer.Session {
      def render(url: String): String =
        try {
          driver.get(url)
          driver.getPageSource
        } catch {
          case _: org.openqa.selenium.TimeoutException =>
            throw new TransientHttpException(s"render timeout: $url")
          case e: org.openqa.selenium.WebDriverException if isTransient(e) =>
            throw new TransientHttpException(
              s"transient navigation failure: $url: ${e.getMessage}")
        }
      override def close(): Unit = driver.quit()
    }
  }

  /** Connection-level churn a retry can fix; DNS failures and crashed
    * sessions are terminal.
    */
  private def isTransient(e: org.openqa.selenium.WebDriverException): Boolean = {
    val m = Option(e.getMessage).getOrElse("")
    m.contains("timeout") || m.contains("ERR_CONNECTION_RESET") ||
      m.contains("ERR_CONNECTION_TIMED_OUT") ||
      m.contains("ERR_NETWORK_CHANGED") || m.contains("ERR_EMPTY_RESPONSE")
  }
}
