package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.stages._
import graft.streaming.{IncrementalState, Streams}

/** The reference's scrape→resume→dedup loop (any_scraper.py:670-801:
  * crawl, skip scraped_urls, dedup new items against the corpus, persist
  * state, resume) as ONE engine dataflow: Rendered.crawl →
  * file-source micro-batches → foreachBatch { IncrementalState skip →
  * incremental near-dup vs parquet LSH state → state append } — two crawl
  * "sessions" over a site that grows between them.
  */
class RenderedIngestFlowSpec extends SparkSpec {
  import spark.implicits._

  private def page(words: String, links: Seq[String]): String =
    s"""<html><body><p>$words</p>
       |${links.map(u => s"""<a href="$u"></a>""").mkString("\n")}
       |</body></html>""".stripMargin

  // 40-word bodies: p6 (session 2) copies p2's text with ONE word swapped
  // -> 3 of 38 shingles differ, exact Jaccard ~0.85; everything else is
  // pairwise distinct.
  private def words(seed: String): String =
    (0 until 40).map(i => s"$seed$i").mkString(" ")
  private val p2Text = words("w")
  private val p6Text = p2Text.replace("w17", "changed")

  private val host = "http://shop.example.com"
  private val site1 = Map(
    s"$host/p1" -> page(words("a"), Seq(s"$host/p2", s"$host/p3")),
    s"$host/p2" -> page(p2Text, Seq(s"$host/p4")),
    s"$host/p3" -> page(words("c"), Seq()),
    s"$host/p4" -> page(words("d"), Seq()))
  // Between sessions the site grows: p1 now also links p5, p5 links p6.
  private val site2 = site1 ++ Map(
    s"$host/p1" -> page(words("a"),
      Seq(s"$host/p2", s"$host/p3", s"$host/p5")),
    s"$host/p5" -> page(words("e"), Seq(s"$host/p6")),
    s"$host/p6" -> page(p6Text, Seq()))

  test("two crawl sessions: resume skips state, new pages dedup vs corpus") {
    val root = Files.createTempDirectory("crawlflow").toFile.getAbsolutePath
    Files.createDirectories(java.nio.file.Paths.get(s"$root/in"))
    val seen = new IncrementalState(spark, s"$root/seen", Seq("url"))

    def crawlToFile(site: Map[String, String], name: String): DataFrame = {
      val pages = Rendered.crawl(spark, new FixtureRenderer(site),
        Seq(s"$host/p1"), maxDepth = 3, skipVisited = seen.processed())
        .filter($"ok").select($"url", $"html")
      // One JSONL file per session = one micro-batch per session.
      val js = pages.select(to_json(struct($"url", $"html")).as("j"))
        .as[String].collect()
      Files.writeString(java.nio.file.Paths.get(s"$root/in/$name.jsonl"),
        js.mkString("\n"))
      pages
    }

    // The ingest handler: a batch is one crawl session's rendered pages.
    // AvailableNow drains what exists and terminates, so each session is
    // its own query RUN resuming from the shared checkpoint — exactly the
    // reference's stop-and-restart loop.
    def runIngest(): Unit = Streams.toForeachBatchSink(
      spark.readStream
        .schema("url STRING, html STRING")
        .option("maxFilesPerTrigger", "1")
        .json(s"$root/in"),
      s"$root/ckpt") { (batch, _) =>
      val s = batch.sparkSession
      // 1. Resume skip: pages a prior session already processed drop here
      //    (start URLs re-render for traversal but must not re-process).
      val fresh = seen.newKeys(batch)
      // 2. Rendered DOM -> document rows: tag-stripped text, id = url hash.
      val docs = fresh.select(xxhash64(col("url")).as("doc_id"),
        trim(regexp_replace(
          regexp_replace(col("html"), "<[^>]*>", " "), "\\s+", " "))
          .as("text"))
      // 3. Near-dup the batch against the accumulated corpus state.
      val empty = Dedup.lshDedupState(docs.limit(0))
      val (bands, sets) =
        if (new java.io.File(s"$root/state/bands").exists())
          (s.read.parquet(s"$root/state/bands"),
            s.read.parquet(s"$root/state/sets"))
        else empty
      Dedup.incrementalNearDups(bands, sets, docs, 0.8)
        .write.mode("append").parquet(s"$root/pairs")
      // 4. Persist this batch's LSH state + processed keys (sets before
      //    bands — bands present must imply sets present on crash).
      val (nb, ns) = Dedup.lshDedupState(docs)
      ns.write.mode("append").parquet(s"$root/state/sets")
      nb.write.mode("append").parquet(s"$root/state/bands")
      fresh.select(col("url"), xxhash64(col("url")).as("doc_id"))
        .write.mode("append").parquet(s"$root/ids")
      seen.commit(fresh)
      Dedup.releaseIndexes()
    }.awaitTermination(180000)

    // Session 1: empty state, the whole site renders and processes.
    val s1 = crawlToFile(site1, "s1")
    assert(s1.select("url").as[String].collect().toSet ==
      Set(s"$host/p1", s"$host/p2", s"$host/p3", s"$host/p4"))
    runIngest()
    assert(spark.read.parquet(s"$root/pairs").count() == 0)
    assert(seen.processed().get.count() == 4)

    // Session 2: the crawl itself skips state (p2/p3/p4 never re-render;
    // p1 re-renders as the traversal root and discovers the new p5).
    val s2 = crawlToFile(site2, "s2")
    assert(s2.select("url").as[String].collect().toSet ==
      Set(s"$host/p1", s"$host/p5", s"$host/p6"))
    runIngest()

    // p1 was in state, so only p5/p6 processed; the one cross-session
    // near-dup pair (p2 -> p6) surfaces with the STATE doc as survivor
    // side doc_a.
    val ids = spark.read.parquet(s"$root/ids")
      .as[(String, Long)].collect().toMap
    assert(ids.size == 6)
    val pairs = spark.read.parquet(s"$root/pairs")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((ids(s"$host/p2"), ids(s"$host/p6"))), pairs)
    assert(seen.processed().get.count() == 6)
  }
}
