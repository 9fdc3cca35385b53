package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Reporting, Sampling, TextAnalysis}

/** One end-to-end run of the LLM training-data curation dataflow the
  * engine adds beyond the reference: PII scrub → quality gate → exact +
  * near-dup + boilerplate dedup → token-budget mixture → corpus report.
  * Every hop is the library operator a real curation deployment would
  * chain, with no mocks anywhere — the flow itself is the assertion that
  * the operators compose on shared column contracts.
  */
class CurationFlowSpec extends SparkSpec {

  test("curation flow: pii -> quality -> dedup -> boilerplate -> mixture -> report") {
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

    // 4. Token-budget mixture: per-source char budget caps the final mix.
    val budget = 2000L
    val mix = kept.join(
      Sampling.tokenBudgetMixture(kept, budget).select($"doc_id"), "doc_id")
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
    val again = kept.join(
      Sampling.tokenBudgetMixture(kept, budget).select($"doc_id"), "doc_id")
    assert(again.select($"doc_id").collect().toSet ==
      mix.select($"doc_id").collect().toSet)
  }
}
