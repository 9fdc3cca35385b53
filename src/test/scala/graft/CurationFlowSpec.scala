package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Flow, Reporting, Sampling, TextAnalysis}

/** One end-to-end run of the LLM training-data curation dataflow the
  * engine adds beyond the reference: PII scrub → quality gate → exact +
  * near-dup + boilerplate + containment dedup → token-budget mixture →
  * corpus report.
  * Every hop is the library operator a real curation deployment would
  * chain, with no mocks anywhere — the flow itself is the assertion that
  * the operators compose on shared column contracts.
  */
class CurationFlowSpec extends SparkSpec {

  test("curation flow: pii -> quality -> dedup -> boilerplate -> containment -> mixture -> report") {
    import spark.implicits._
    val docs = tables.documents
    val n0 = docs.count()

    // 1. PII scrub: downstream sees redacted text only, same schema.
    val scrubbed = docs
      .join(TextAnalysis.piiScan(docs).select($"doc_id", $"redacted"), "doc_id")
      .select($"doc_id", $"redacted".as("text"), $"lang", $"source", $"n_chars")
    assert(scrubbed.count() == n0)

    // 2. Quality gate.
    val accepted = scrubbed.join(
      TextAnalysis.qualityScore(scrubbed)
        .filter($"accept").select($"doc_id"), "doc_id")
    val n1 = accepted.count()
    assert(n1 > 0 && n1 <= n0)

    // 3a. Exact dedup: one survivor per distinct content.
    val unique = accepted.join(
      Dedup.exactDedupGroups(accepted).select($"keep_id".as("doc_id")), "doc_id")
    val n2 = unique.count()
    assert(n2 > 0 && n2 <= n1)

    // 3b. Near-dup: of every verified pair, the lower id survives.
    val losers = Dedup.jaccardNearDups(unique, 0.6, Dedup.defaultMaxDf)
      .select($"doc_b".as("doc_id")).distinct()
    val deduped = unique.join(losers, Seq("doc_id"), "left_anti")
    val n3 = deduped.count()
    assert(n3 == n2 - losers.count())

    // 3c. Boilerplate cut against the full corpus's shingle sharing.
    val boiler = Dedup.boilerplateRatio(deduped)
      .filter($"boilerplate").select($"doc_id")
    val kept = deduped.join(boiler, Seq("doc_id"), "left_anti")
    val n4 = kept.count()
    assert(n4 == n3 - boiler.count())

    // 3d. Containment trim: a doc mostly quoted inside another surviving
    // doc is redundant even when Jaccard missed it (the asymmetric case).
    // Drop the CONTAINED side; mutual containment (near-identical sets,
    // both directions >= minC) keeps the lower id — same survivor rule as
    // every other dedup hop, so the stage is deterministic.
    // Flow.stageBoundary = the stage boundary a real pipeline
    // materializes to parquet: without it the containment self-joins
    // embed the whole upstream flow plan on BOTH sides and Catalyst
    // optimization time explodes combinatorially (driver-CPU-bound, not
    // an executor cost). Unconfigured it is localCheckpoint; with
    // graft.flow.boundaryDir set it becomes the parquet round-trip.
    val keptM = Flow.stageBoundary(kept, "kept")
    val cont = Flow.stageBoundary(
      Dedup.containmentDups(keptM, 0.8).select($"doc_a", $"doc_b"), "cont")
    val mutual = cont.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b"))
      .withColumn("mut", lit(true))
    val contLosers = cont.join(mutual, Seq("doc_a", "doc_b"), "left")
      .filter($"mut".isNull || $"doc_a" > $"doc_b")
      .select($"doc_a".as("doc_id")).distinct()
    val trimmed = keptM.join(contLosers, Seq("doc_id"), "left_anti")
    val nTrimmedAway = contLosers.count()
    val n5 = trimmed.count()
    assert(n5 == n4 - nTrimmedAway)
    // The trim is complete: no containment pair survives with both ends
    // kept (a non-mutual pair drops its contained side; a mutual pair
    // drops the higher id — either way at most one end remains).
    assert(cont
      .join(trimmed.select($"doc_id".as("doc_a")), "doc_a")
      .join(trimmed.select($"doc_id".as("doc_b")), "doc_b")
      .count() == 0)

    // The corpus report ACCOUNTS for the containment trim: totals over
    // the trimmed corpus differ from the pre-trim corpus by exactly the
    // number of containment-trimmed docs.
    val preTrim = Reporting.corpusReport(keptM).collect()
      .map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    val postTrim = Reporting.corpusReport(trimmed).collect()
      .map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    assert(preTrim - postTrim == nTrimmedAway)

    // 4. Token-budget mixture: per-source char budget caps the final mix.
    val budget = 2000L
    val mix = trimmed.join(
      Sampling.tokenBudgetMixture(trimmed, budget).select($"doc_id"), "doc_id")
    val perSource = mix.groupBy($"source")
      .agg(sum($"n_chars").as("chars"), max($"n_chars").as("maxc")).collect()
    // The running-sum cut admits the first doc crossing the line, so a
    // source's total stays under budget + its largest admitted doc.
    assert(perSource.forall(r => r.getLong(1) < budget + r.getLong(2)))

    // 5. Corpus report over the curated mix: one row per surviving
    // (source, lang) with internally-consistent counts.
    val report = Reporting.corpusReport(mix).collect()
    assert(report.nonEmpty)
    val reported = report.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    assert(reported == mix.count())

    // The whole flow is deterministic: a rerun selects the same ids.
    val again = trimmed.join(
      Sampling.tokenBudgetMixture(trimmed, budget).select($"doc_id"), "doc_id")
    assert(again.select($"doc_id").collect().toSet ==
      mix.select($"doc_id").collect().toSet)
  }

  test("Flow.stageBoundary: parquet mode persists the cut under boundaryDir, content identical") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, s"doc $i"))
      .toDF("doc_id", "text")
    val local = Flow.stageBoundary(df).collect().map(_.toSeq).toSet
    val dir = java.nio.file.Files.createTempDirectory("flowbound").toString
    spark.conf.set("graft.flow.boundaryDir", dir)
    try {
      val persisted = Flow.stageBoundary(df, "scrub")
      assert(persisted.collect().map(_.toSeq).toSet == local)
      // The cut is durable and named: a fresh read of the boundary dir
      // (what a resumed pipeline does) sees the same rows.
      assert(spark.read.parquet(s"$dir/scrub").count() == 100)
      // Anonymous boundaries get unique ordinals — two cuts don't
      // clobber each other.
      Flow.stageBoundary(df.filter($"doc_id" < 10))
      Flow.stageBoundary(df.filter($"doc_id" < 20))
      val stages = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(stages.count(_.startsWith("stage-")) == 2, s"stages: $stages")
    } finally spark.conf.unset("graft.flow.boundaryDir")
  }

  test("Flow.stageBoundary: named boundaries resume across sessions without recomputing upstream") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("flowresume").toString
    spark.conf.set("graft.flow.boundaryDir", dir)
    try {
      // Run 1: a two-stage flow, both boundaries persisted.
      val df = (0 until 50).map(i => (i.toLong, s"doc $i"))
        .toDF("doc_id", "text")
      val s1 = Flow.stageBoundary(df, "res-scrub")
      val s2 = Flow.stageBoundary(s1.filter($"doc_id" < 25), "res-dedup")
      val run1 = s2.collect().map(_.toSeq).toSet
      assert(run1.size == 25)

      // "Kill the flow, start fresh": a NEW session re-runs the same
      // flow — with its stage-1 input POISONED by a throwing UDF. If
      // resume really replays the boundaries as parquet scans, the
      // poison is never evaluated and the output matches run 1 exactly;
      // any recompute detonates it.
      val spark2 = spark.newSession()
      spark2.conf.set("graft.flow.boundaryDir", dir)
      val boom = udf { (i: Long) =>
        if (i >= 0)
          throw new RuntimeException("stage-1 recomputed on resume")
        s"doc $i"
      }
      val poisoned = spark2.range(50)
        .select($"id".as("doc_id"), boom($"id").as("text"))
      val r1 = Flow.stageBoundary(poisoned, "res-scrub")
      val r2 = Flow.stageBoundary(r1.filter($"doc_id" < 25), "res-dedup")
      assert(r2.collect().map(_.toSeq).toSet == run1)
      // And the resumed stages really are file scans of the boundary.
      val plan = r2.queryExecution.executedPlan.toString
      assert(plan.contains("res-dedup") && plan.contains("Parquet"),
        s"expected a parquet scan of the boundary, got:\n$plan")

      // A died-mid-write boundary (no _SUCCESS marker) is NOT trusted:
      // the stage recomputes and overwrites it.
      val partial = new java.io.File(s"$dir/res-partial")
      partial.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/res-partial/part-junk"), "junk")
      val healed = Flow.stageBoundary(df.filter($"doc_id" < 5),
        "res-partial")
      assert(healed.count() == 5)

      // graft.flow.resume=false forces recompute — the post-edit knob.
      spark.conf.set("graft.flow.resume", "false")
      val recomputed = Flow.stageBoundary(df.filter($"doc_id" < 10),
        "res-scrub")
      assert(recomputed.count() == 10)
    } finally {
      spark.conf.unset("graft.flow.boundaryDir")
      spark.conf.unset("graft.flow.resume")
    }
  }
}
