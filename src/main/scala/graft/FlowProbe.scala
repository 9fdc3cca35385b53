package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Reporting, Sampling, TextAnalysis}

/** Scratch scale probe for the COMPOSED curation flow — NOT part of the
  * driver contract. Runs CurationFlowSpec's dataflow (PII scrub →
  * quality gate → exact + near-dup + boilerplate + containment dedup →
  * token-budget mixture → corpus report) on a real corpus and reports
  * the wall split between Catalyst PLANNING (analyze/optimize/plan,
  * driver single-core) and EXECUTION (the jobs), per the r11 verdict's
  * task 5: the localCheckpoint stage-boundary lesson is recorded at toy
  * scale in the spec; this measures it at sf0.1 and 10×.
  *
  *   SPARK_GRAFT_SF_DIR=bench/sf1 tools/run.sh graft.FlowProbe [nockpt]
  *
  * Default mode materializes the containment stage boundary exactly as
  * the spec ships it (localCheckpoint — the in-test analog of the
  * parquet write a real pipeline does between curation stages); `nockpt`
  * runs the identical flow with an unbroken lineage, the shape whose
  * planning cost explodes combinatorially (plan-tree size, so
  * data-size-INDEPENDENT — the 1× number is the 10× number).
  *
  * Planning is timed by forcing `queryExecution.executedPlan` on the
  * exact Dataset each action then reuses (QueryExecution is a lazy val,
  * so the action does not re-plan); execution is the remainder.
  */
object FlowProbe {
  private var planS = 0.0
  private var execS = 0.0

  private def timed[A](df: DataFrame)(action: DataFrame => A): A = {
    val t0 = System.nanoTime()
    df.queryExecution.executedPlan
    val t1 = System.nanoTime()
    val out = action(df)
    val t2 = System.nanoTime()
    planS += (t1 - t0) / 1e9
    execS += (t2 - t1) / 1e9
    out
  }

  private def countOf(df: DataFrame): Long =
    timed(df.groupBy().count())(_.collect()(0).getLong(0))

  def main(args: Array[String]): Unit = {
    val ckpt = !args.contains("nockpt")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.load(spark, sfDir).documents
    docs.count() // warm scan, uncounted (as in Bench)

    val t0 = System.nanoTime()
    val scrubbed = docs
      .join(TextAnalysis.piiScan(docs).select($"doc_id", $"redacted"), "doc_id")
      .select($"doc_id", $"redacted".as("text"), $"lang", $"source", $"n_chars")
    val accepted = scrubbed.join(
      TextAnalysis.qualityScore(scrubbed)
        .filter($"accept").select($"doc_id"), "doc_id")
    val unique = accepted.join(
      Dedup.exactDedupGroups(accepted).select($"keep_id".as("doc_id")), "doc_id")
    val losers = Dedup.jaccardNearDups(unique, 0.6, Dedup.defaultMaxDf)
      .select($"doc_b".as("doc_id")).distinct()
    val deduped = unique.join(losers, Seq("doc_id"), "left_anti")
    // The synthetic corpus is template-generated, so its cross-doc
    // 3-gram sharing sits far above real-web levels; the cut threshold
    // is a knob so the probe exercises the stage without emptying the
    // corpus (the operator itself is distribution-agnostic).
    val maxRatio = sys.env.getOrElse("SPARK_GRAFT_BOILER_MAX", "0.5").toDouble
    if (sys.env.contains("SPARK_GRAFT_FLOW_DEBUG"))
      Dedup.boilerplateRatio(deduped, maxRatio)
        .selectExpr("percentile_approx(dup_ratio, array(0.01,0.1,0.5,0.9,0.99)) p")
        .collect().foreach(r => println(s"FLOWDEBUG dup_ratio_pcts=${r.get(0)}"))
    val boiler = Dedup.boilerplateRatio(deduped, maxRatio)
      .filter($"boilerplate").select($"doc_id")
    val kept = deduped.join(boiler, Seq("doc_id"), "left_anti")
    // The checkpoints run through timed() too, so their planning AND
    // materialization land in the split instead of vanishing into
    // dataflow-construction time.
    val keptM =
      if (ckpt) timed(kept)(operators.Flow.stageBoundary(_, "kept"))
      else kept
    val contRaw = Dedup.containmentDups(keptM, 0.8).select($"doc_a", $"doc_b")
    val cont =
      if (ckpt) timed(contRaw)(operators.Flow.stageBoundary(_, "cont"))
      else contRaw
    val mutual = cont.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b"))
      .withColumn("mut", lit(true))
    val contLosers = cont.join(mutual, Seq("doc_a", "doc_b"), "left")
      .filter($"mut".isNull || $"doc_a" > $"doc_b")
      .select($"doc_a".as("doc_id")).distinct()
    val trimmed = keptM.join(contLosers, Seq("doc_id"), "left_anti")
    val budget = 2000L
    val mix = trimmed.join(
      Sampling.tokenBudgetMixture(trimmed, budget).select($"doc_id"), "doc_id")
    if (sys.env.contains("SPARK_GRAFT_FLOW_DEBUG")) {
      Seq("scrubbed" -> scrubbed, "accepted" -> accepted, "unique" -> unique,
        "deduped" -> deduped, "kept" -> kept, "trimmed" -> trimmed,
        "mix" -> mix).foreach { case (n, df) =>
        println(s"FLOWDEBUG $n=${df.count()}") }
    }
    val report = timed(Reporting.corpusReport(mix))(_.collect())
    val nMix = countOf(mix)
    val total = (System.nanoTime() - t0) / 1e9
    def s3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"FLOWPROBE dir=$sfDir ckpt=$ckpt plan_s=${s3(planS)} " +
      s"exec_s=${s3(execS)} total_s=${s3(total)} mix_rows=$nMix " +
      s"report_rows=${report.length}")
    spark.stop()
  }
}
