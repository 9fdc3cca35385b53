package graft

import org.apache.spark.sql.SparkSession

/** Scratch scale-probe main for the text near-dup family — NOT part of
  * the driver contract. Replicates [[Bench]]'s semantics (same session
  * config, same sorted execution order, so intra-family cache sharing
  * matches the bench capture) restricted to the queries
  * bench/bench_r10_sf1.json tracks at 1× (sf0.1) and 10× (bench/sf1)
  * scale. One timing set per JVM run; medians are taken across 3 runs,
  * as in the r9 probe.
  *
  *   SPARK_GRAFT_SF_DIR=bench/sf1 tools/run.sh graft.TextProbe
  */
object TextProbe {
  private val defaultFamily = Seq(
    "q26_neardup_jaccard", "q27_neardup_lsh", "q47_simhash_pairs",
    "q70_source_overlap", "q77_dedup_state_build",
    "q77_incremental_neardups")

  def main(args: Array[String]): Unit = {
    // Any SparkEntry query names as args override the text family —
    // the same timing harness serves ad-hoc probes (e.g. the ANN/IVF
    // family) without another scratch main.
    val family = if (args.nonEmpty) args.toSeq else defaultFamily
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench/sf1")
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
    // Warmup as in Bench: JVM/codegen/scan setup uncounted.
    try {
      val t = Tables.load(spark, sfDir)
      Seq(t.documents, t.embeddings).foreach(_.count())
    } catch { case _: Throwable => () }
    // "q92@<nlist>" probes semanticDedup with a scaled cluster count —
    // the FAISS-sizing experiment (nlist tracks corpus size) without
    // changing the driver-contract query's fixed geometry.
    // Malformed probe names (q92@, q92@abc, a future query containing @)
    // fall through to the registry lookup and fail with its unknown-query
    // error instead of a bare NumberFormatException mid-loop.
    // "q92@<nlist>@<capFactor>" probes the hot-cluster guard on the
    // embh corpora (tools/gen_emb_hot.py) at a realistic minCos=0.8:
    // capFactor=0 is the unguarded (quadratic on hot mass) baseline.
    def run(name: String) = name.split("@") match {
      case Array("q92", nlist) if scala.util.Try(nlist.toInt).isSuccess =>
        graft.operators.Similarity.semanticDedupAt(
          Tables.load(spark, sfDir).embeddings, 0.35, nlist.toInt)
      case Array("q92", nlist, cf)
          if scala.util.Try(nlist.toInt).isSuccess &&
            scala.util.Try(cf.toInt).isSuccess =>
        graft.operators.Similarity.semanticDedupAt(
          Tables.load(spark, sfDir).embeddings, 0.8, nlist.toInt,
          capFactor = cf.toInt)
      // Fourth field: hash-cap training fraction — the big-corpus probes
      // sample training (as the auto path does) so the guarded-vs-
      // unguarded comparison measures the PRUNE, not shared Lloyd cost.
      case Array("q92", nlist, cf, tf)
          if scala.util.Try(nlist.toInt).isSuccess &&
            scala.util.Try(cf.toInt).isSuccess &&
            scala.util.Try(tf.toDouble).isSuccess =>
        graft.operators.Similarity.semanticDedupAt(
          Tables.load(spark, sfDir).embeddings, 0.8, nlist.toInt,
          capFactor = cf.toInt, trainFrac = tf.toDouble)
      case _ => SparkEntry.queries(name)(spark, sfDir)
    }
    family.foreach { name =>
      // SPARK_GRAFT_EXPLAIN=formatted dumps the plan before timing (the
      // toRdd action emits no SQL-listener events, so this is the only
      // window into what the probe actually executes).
      sys.env.get("SPARK_GRAFT_EXPLAIN").foreach { mode =>
        if (mode == "final") {
          // Execute first so AQE finalizes, then print the real plan
          // (with codegen ids) — the pre-execution explain shows the
          // initial plan only.
          val df = run(name)
          df.queryExecution.toRdd.count()
          println(df.queryExecution.executedPlan.toString)
        } else run(name).explain(mode)
      }
      val t0 = System.nanoTime()
      // toRdd.count, not count(): see Bench — count() lets the optimizer
      // eliminate count-invariant work (q92's final prune join!), so a
      // count-timed probe measures a different (cheaper) plan.
      val rows = run(name).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // Locale.ROOT like Bench: comma-decimal locales must not change output.
      val s3 = String.format(java.util.Locale.ROOT, "%.3f", sec)
      println(s"TEXTPROBE dir=$sfDir q=$name sec=$s3 rows=$rows")
    }
    spark.stop()
  }
}
