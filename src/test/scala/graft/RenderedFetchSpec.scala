package graft

import org.apache.spark.sql.functions._

import graft.stages._

/** End-to-end drive of the JS-rendered ingestion seam on the
  * deterministic fake renderer: pagination (a rendered site crawled
  * wave-by-wave), extraction, same-domain guard, visited dedup, image
  * plan dedup, retry composition, and session lifecycle — everything the
  * Selenium/Crawlbase adapter would flow through in production, minus the
  * browser itself.
  */
class RenderedFetchSpec extends SparkSpec {

  private def page(title: String, links: Seq[String],
      imgs: Seq[String]): String =
    s"""<!DOCTYPE html><html><head><title>$title</title></head><body>
       |${imgs.map(u => s"""<img class="p" src="$u" alt="">""").mkString("\n")}
       |${links.map(u => s"""<a href="$u">next</a>""").mkString("\n")}
       |<a href="/relative/skipped">rel</a>
       |</body></html>""".stripMargin

  // A three-level site: page1 -> {page2, page3, offsite}, page2 -> page4,
  // page2/page3 share one CDN image. All DOM is "post-JS" fixture state.
  private val site = Map(
    "http://shop.example.com/p1" -> page("p1",
      Seq("http://shop.example.com/p2", "http://shop.example.com/p3",
        "http://other.example.net/elsewhere"),
      Seq("http://cdn.example.com/a.jpg")),
    "http://shop.example.com/p2" -> page("p2",
      Seq("http://shop.example.com/p4", "http://shop.example.com/p1"),
      Seq("http://cdn.example.com/shared.jpg", "http://cdn.example.com/b.jpg")),
    "http://shop.example.com/p3" -> page("p3", Seq(),
      Seq("http://cdn.example.com/shared.jpg")),
    "http://shop.example.com/p4" -> page("p4", Seq(), Seq()),
    "http://other.example.net/elsewhere" -> page("offsite", Seq(), Seq()))

  test("distributed BFS crawl: waves, same-domain guard, visited dedup") {
    val out = Rendered.crawl(spark, new FixtureRenderer(site),
      Seq("http://shop.example.com/p1"), maxDepth = 2).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    // p1 at depth 0; p2/p3 at 1; p4 at 2. The offsite link is never
    // rendered (same-domain guard) and p1's back-link from p2 never
    // re-renders (visited anti-join).
    assert(out == Map(
      "http://shop.example.com/p1" -> (0, true),
      "http://shop.example.com/p2" -> (1, true),
      "http://shop.example.com/p3" -> (1, true),
      "http://shop.example.com/p4" -> (2, true)), out)
  }

  test("maxDepth and maxPages bound the crawl") {
    val shallow = Rendered.crawl(spark, new FixtureRenderer(site),
      Seq("http://shop.example.com/p1"), maxDepth = 1).collect()
    assert(shallow.map(_.getString(0)).toSet ==
      Set("http://shop.example.com/p1", "http://shop.example.com/p2",
        "http://shop.example.com/p3"))
    val capped = Rendered.crawl(spark, new FixtureRenderer(site),
      Seq("http://shop.example.com/p1"), maxDepth = 5, maxPages = 1)
    assert(capped.count() == 1L)
  }

  test("empty start set is the crawl identity, not an NPE") {
    val out = Rendered.crawl(spark, new FixtureRenderer(site),
      Seq.empty, maxDepth = 3)
    assert(out.count() == 0L)
    assert(out.columns.toSeq ==
      Seq("url", "depth", "ok", "html", "error"))
  }

  test("a binding page budget renders a deterministic page set") {
    // Four pages reachable, budget 2: which two render must be a function
    // of the site, not of partition/fetch order. Crawl twice with
    // different frontier partitionings forced via shuffle.partitions and
    // assert identical (url, depth) sets — and specifically the
    // lexicographic-least URLs of each wave.
    def crawlSet(parts: String): Set[(String, Int)] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try Rendered.crawl(spark, new FixtureRenderer(site),
        Seq("http://shop.example.com/p1"), maxDepth = 2, maxPages = 2)
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val a = crawlSet("3")
    val b = crawlSet("17")
    assert(a == b, s"budget-bound crawl is partition-order-dependent: $a vs $b")
    // Wave 0 takes p1 (budget 2 -> 1); wave 1's frontier {p2, p3} is cut
    // to the lexicographically first.
    assert(a == Set(("http://shop.example.com/p1", 0),
      ("http://shop.example.com/p2", 1)), a)
  }

  test("navigation failures are ok=false rows, not job failures") {
    val out = Rendered.crawl(spark, new FixtureRenderer(site),
      Seq("http://shop.example.com/p1", "http://shop.example.com/missing"),
      maxDepth = 0).collect()
    val byUrl = out.map(r => r.getString(0) ->
      (r.getBoolean(2), r.getString(4))).toMap
    assert(byUrl("http://shop.example.com/p1")._1)
    val (ok, err) = byUrl("http://shop.example.com/missing")
    assert(!ok && err.contains("navigation failed"))
  }

  test("image fetch plan: extraction + cross-page CDN dedup") {
    import spark.implicits._
    val pages = Rendered.crawl(spark, new FixtureRenderer(site),
      Seq("http://shop.example.com/p1"), maxDepth = 2)
      .select($"url".as("pageUrl"), $"ok", $"html")
      .withColumn("id", lit(0L))
      .select($"id", $"pageUrl".as("url"), $"ok", $"html",
        lit("").as("error"))
      .as[RenderedPage]
    val plan = Rendered.imageFetchPlan(pages).collect()
      .map(_.getString(1)).toSet
    // shared.jpg appears on p2 AND p3 but downloads once.
    assert(plan == Set("http://cdn.example.com/a.jpg",
      "http://cdn.example.com/shared.jpg", "http://cdn.example.com/b.jpg"))
  }

  test("transient render failures retry through the production wrapper") {
    import spark.implicits._
    val flaky = new FixtureRenderer(site,
      flakyUrls = Set("http://shop.example.com/p3"), flakyAttempts = 2)
    val out = RetryStage.wrap(new RenderedFetchStage(flaky),
        maxAttempts = 3, baseBackoffMs = 1L)
      .run(Seq(FetchRequest(1L, "http://shop.example.com/p2"),
        FetchRequest(2L, "http://shop.example.com/p3")).toDS()
        .repartition(1)) // one session, so the flaky counter is shared
      .collect().map(a => a.value.get.url -> a.attempts).toMap
    assert(out("http://shop.example.com/p2") == 1)
    assert(out("http://shop.example.com/p3") == 3) // 2 timeouts + success
  }

  test("relative links and offsite images never leak into the plans") {
    import spark.implicits._
    val html = Seq(site("http://shop.example.com/p1")).toDF("html")
    val links = html.select(explode(Rendered.links($"html")).as("u"))
      .as[String].collect().toSet
    assert(links.forall(_.startsWith("http")), links)
    assert(!links.exists(_.contains("relative")), links)
    val imgs = html.select(explode(Rendered.imageSrcs($"html")).as("u"))
      .as[String].collect().toSet
    assert(imgs == Set("http://cdn.example.com/a.jpg"))
  }
}
