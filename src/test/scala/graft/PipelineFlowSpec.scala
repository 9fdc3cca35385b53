package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}
import graft.stages._

/** One end-to-end run of the reference's orchestrator dataflow
  * (/root/reference/data_pipeline/core/pipeline_orchestrator.py:64-102):
  * weighted sampling → ingest+dedup → resume filter → person×cloth
  * pairing → VL analysis → edit generation → run report. Every hop is the
  * library operator a real deployment would use; the mocks stand in for
  * the GPU models only.
  */
class PipelineFlowSpec extends SparkSpec {

  test("orchestrator flow: sample -> dedup -> resume -> pair -> VL -> edit -> report") {
    import spark.implicits._

    // 1. Weighted keyword sampling (W1/W8/W9) seeds the run.
    val prompts = Sampling.sampledRecord(tables.documents)
      .select($"doc_id",
        format_string("a %s %s in %s style", $"color", $"garment", $"style")
          .as("prompt"))
    assert(prompts.count() == tables.documents.count())

    // 2. Ingest + exact dedup (D1/D2): unique content survives once.
    val unique = Dedup.exactDedupGroups(tables.documents)
      .select($"keep_id".as("doc_id"))
    val n0 = unique.count()
    assert(n0 > 0 && n0 <= tables.documents.count())

    // 3. Resume (D3/J3): drop items already processed in a previous run.
    val processed = unique.limit(100).select($"doc_id".as("done_id"))
    val todo = unique.join(processed,
      unique("doc_id") === processed("done_id"), "left_anti")
    assert(todo.count() == n0 - 100)

    // 4. Person × cloth pairing with per-side caps (J1/R3).
    val persons = todo.limit(6).select($"doc_id".as("person_id"))
    val cloths = todo.orderBy($"doc_id".desc).limit(3)
      .select($"doc_id".as("cloth_id"))
    val pairs = persons.crossJoin(cloths)
      .join(prompts, $"cloth_id" === prompts("doc_id"))
      .select(
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"person_id", $"cloth_id")) - 1).cast("long").as("pairId"),
        concat(lit("person_"), $"person_id").as("personRef"),
        concat(lit("cloth_"), $"cloth_id").as("clothRef"),
        $"prompt".as("context"))
      .as[VlInput]
    assert(pairs.count() == 18)

    // 5-6. VL analysis then edit generation (M1/M3), deterministic mocks.
    val edits = MockEditStage.run(MockVlStage.run(pairs))

    // 7. Run report (A1/A2/A5).
    val report = edits.groupBy()
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"status" === "success", 1L).otherwise(0L)).as("n_success"),
        sum(when($"status" =!= "success", 1L).otherwise(0L)).as("n_failed"))
      .first()
    assert(report.getLong(0) == 18)
    assert(report.getLong(1) + report.getLong(2) == 18)

    // The whole flow is a pure function of the inputs: rerunning yields
    // byte-identical edit results (retry/speculation safety).
    val again = MockEditStage.run(MockVlStage.run(pairs))
    assert(again.collect().toSet == edits.collect().toSet)
  }
}
