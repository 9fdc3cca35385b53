package graft.stages

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** JS-rendered page ingestion (reference S6', the one source path plain
  * HTTP can't reach: Selenium deep crawl at
  * /root/reference/data_pipeline/scrapers/robust_scraper.py:137-189 and
  * the Crawlbase rendered-fetch API at
  * /root/reference/data_pipeline/scrapers/any_scraper.py:118-159).
  *
  * The engine side is a seam, exactly like [[MediaStage.VideoCodec]] wraps
  * ffmpeg-shaped work: [[PageRenderer]] is "launch a browser session once
  * per partition, render URLs to final-DOM HTML through it". A Selenium
  * adapter (`webdriver.Chrome` behind `open()`, `driver.get(url)` +
  * `driver.getPageSource` behind `render`) or a Crawlbase adapter (one
  * HTTP GET to the rendering API per `render`) each implement the same
  * two methods on a deployment that ships them — neither browser binaries
  * nor network egress exist in this environment, so the in-repo
  * implementation is [[FixtureRenderer]], a deterministic static-DOM fake
  * that keeps everything downstream (extraction, same-domain filtering,
  * the BFS frontier loop, retry composition) on its production path.
  */
final case class RenderedPage(id: Long, url: String, ok: Boolean,
    html: String, error: String)

/** One browser/rendering-API session factory. `open()` runs once per
  * partition inside [[RenderedFetchStage.setup]] — the place a Selenium
  * adapter pays the driver launch, mirroring how model stages load
  * weights. `render` returns the final DOM after JS execution; throw
  * [[TransientHttpException]] for retryable failures (timeouts, 5xx-like
  * API errors) so [[RetryStage]] composes, any other exception is a
  * terminal per-row failure.
  */
trait PageRenderer extends Serializable {
  def open(): PageRenderer.Session
}

object PageRenderer {
  trait Session {
    def render(url: String): String
    def close(): Unit = ()
  }
}

/** DETERMINISTIC FAKE renderer: URL → fixture DOM. Unknown URLs fail
  * terminally (like a navigation error); URLs in `flakyUrls` throw
  * transiently the first `flakyAttempts` times per session to exercise
  * the retry path. This is the test stand-in; real deployments plug a
  * Selenium/Crawlbase [[PageRenderer]] behind the same seam.
  */
final class FixtureRenderer(fixtures: Map[String, String],
    flakyUrls: Set[String] = Set.empty, flakyAttempts: Int = 1)
    extends PageRenderer {
  def open(): PageRenderer.Session = new PageRenderer.Session {
    private val seen = scala.collection.mutable.Map.empty[String, Int]
    def render(url: String): String = {
      if (flakyUrls.contains(url)) {
        val n = seen.getOrElse(url, 0)
        seen(url) = n + 1
        if (n < flakyAttempts)
          throw new TransientHttpException(s"render timeout: $url")
      }
      fixtures.getOrElse(url,
        throw new IllegalArgumentException(s"navigation failed: $url"))
    }
  }
}

/** The rendered-fetch stage: one renderer session per partition, URLs
  * streamed through it, failures as rows (F4-style), transient throws
  * left for [[RetryStage]].
  */
final class RenderedFetchStage(renderer: PageRenderer)
    extends InferenceStage[FetchRequest, RenderedPage] {
  def setup(): ModelHandle[FetchRequest, RenderedPage] = {
    val session = renderer.open()
    new ModelHandle[FetchRequest, RenderedPage] {
      def infer(in: FetchRequest): RenderedPage =
        try RenderedPage(in.id, in.url, ok = true, session.render(in.url), "")
        catch {
          case t: TransientHttpException => throw t
          case e: Exception =>
            RenderedPage(in.id, in.url, ok = false, "",
              s"${e.getClass.getSimpleName}: ${e.getMessage}")
        }
    }
  }
}

/** The Spark-side crawl semantics over rendered DOM — extraction as
  * codegen column expressions and the reference's recursive deep crawl
  * re-expressed as a distributed BFS.
  */
object Rendered {

  /** `<img src=...>` extraction (robust_scraper.py:161-163 reads the same
    * attribute off rendered elements), absolute http(s) URLs only, as the
    * reference's `src.startswith('http')` guard.
    */
  def imageSrcs(html: Column): Column =
    filter(
      regexp_extract_all(html,
        lit("(?i)<img\\b[^>]*?\\bsrc\\s*=\\s*[\"']([^\"']+)[\"']"), lit(1)),
      u => u.startsWith("http"))

  /** `<a href=...>` extraction (robust_scraper.py:175-177). */
  def links(html: Column): Column =
    filter(
      regexp_extract_all(html,
        lit("(?i)<a\\b[^>]*?\\bhref\\s*=\\s*[\"']([^\"']+)[\"']"), lit(1)),
      u => u.startsWith("http"))

  /** The reference's deep crawl (robust_scraper.py:152-186) as a
    * distributed BFS: render the frontier, keep every page, follow
    * same-domain links not yet visited, `maxDepth` waves. Differences
    * from the single-browser recursion are deliberate scale choices:
    * the visited set is a distributed anti-join (not a driver Set), each
    * wave renders in parallel across partitions, and `maxPages` bounds
    * total work like the reference's max_images budget. Frontiers are
    * tiny relative to page bodies, so each wave materializes only
    * (url) frontier rows plus the rendered pages it keeps.
    *
    * Returns (url, depth, ok, html, error) for every page rendered.
    *
    * `skipVisited` is the cross-session resume hook (the reference's
    * scraped_urls check, any_scraper.py:103-116): a (url) DataFrame —
    * typically [[graft.streaming.IncrementalState.processed]] — seeded
    * into the visited set, so a resumed crawl never re-renders pages a
    * prior session already processed. Start URLs always render (they are
    * the traversal roots — a listing page must be re-read to discover
    * NEW links even when it was seen before); everything downstream of
    * them honors the skip.
    */
  def crawl(spark: SparkSession, renderer: PageRenderer,
      startUrls: Seq[String], maxDepth: Int,
      maxPages: Int = 10000,
      skipVisited: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._
    val stage = new RenderedFetchStage(renderer)

    def render(frontier: DataFrame): DataFrame =
      stage.run(frontier.select($"url").as[String]
          .map(u => FetchRequest(0L, u)))
        .toDF().drop("id")

    val starts = startUrls.distinct.toDF("url")
    var visited = skipVisited.fold(starts)(s =>
      starts.unionByName(s.select($"url")).distinct())
    var frontier = starts
    // Empty-crawl identity: zero start URLs returns zero pages, not an NPE.
    var out: DataFrame = spark.emptyDataset[RenderedPage].toDF()
      .drop("id").withColumn("depth", lit(0))
    var depth = 0
    var budget = maxPages
    while (depth <= maxDepth && budget > 0 && !frontier.isEmpty) {
      // orderBy before the limit: when the page budget binds mid-wave,
      // WHICH pages get rendered must be a function of the frontier's
      // contents, not of partition order — the same determinism doctrine
      // as the hash-derived draws and sorted sink bytes elsewhere. The
      // sort is over a wave's frontier (URLs only, tiny vs page bodies).
      val pages = render(frontier.orderBy($"url").limit(budget))
        .withColumn("depth", lit(depth))
        .localCheckpoint() // one render per wave, reused by out + frontier
      budget -= pages.count().toInt
      out = out.unionByName(pages)
      if (depth < maxDepth) {
        // Same-domain guard against the page that linked it, like the
        // reference's netloc comparison — then dedup against everything
        // rendered or queued so far.
        val next = pages.filter($"ok")
          .select(explode(links($"html")).as("link"),
            parse_url($"url", lit("HOST")).as("srcHost"))
          .filter(parse_url($"link", lit("HOST")) === $"srcHost")
          .select($"link".as("url")).distinct()
          .join(visited, Seq("url"), "left_anti")
        frontier = next.localCheckpoint()
        visited = visited.unionByName(frontier).localCheckpoint()
      } else frontier = spark.emptyDataFrame.withColumn("url", lit(""))
      depth += 1
    }
    out.select($"url", $"depth", $"ok", $"html", $"error")
  }

  /** The page→image composition the Selenium crawl performs inline
    * (render, pull img srcs, fetch each image): rendered pages to a
    * one-row-per-image fetch plan, distinct so shared CDN assets download
    * once — feed it to [[HttpFetchStage.withRetry]] with expectImage=true.
    */
  def imageFetchPlan(pages: Dataset[RenderedPage]): DataFrame = {
    import pages.sparkSession.implicits._
    pages.toDF().filter($"ok")
      .select(explode(imageSrcs($"html")).as("url")).distinct()
      .withColumn("id", xxhash64($"url"))
      .select($"id", $"url")
  }
}
