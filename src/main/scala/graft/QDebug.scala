package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling/diagnosis main (not part of the driver contract).
  *
  * Times the named queries, in the given order, under the same session
  * shape as [[Bench]] (same master/shuffle config, same uncounted warmup)
  * so a subset run reproduces the bench's cache conditions — run the
  * alphabetical predecessors of a suspect query first to reproduce its
  * bench-time cache state.
  *
  *   sbt "runMain graft.QDebug q37_cosine_topk q38_cosine_topk_lsh q51_cosine_topk_ivf"
  */
object QDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // SPARK_GRAFT_PARTS decouples the shuffle-partition count from the
      // core count for A/B isolation of "more cores" vs "more partitions".
      .config("spark.sql.shuffle.partitions",
        sys.env.get("SPARK_GRAFT_PARTS").map(_.toInt)
          .getOrElse(cpus.toInt * 2))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Mirror Bench: AQE coalescing applies inside cached-plan
      // materialization (see Bench.scala for the measured 2× effect).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Keep cache-build cost identical to Bench (uncompressed columnar
      // cache; the shingle index builds ~2x faster without the encoders).
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-job timing: which jobs inside a slow query actually cost time.
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        private val starts =
          new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(js.jobId, (System.nanoTime(),
            js.stageInfos.headOption.map(_.name).getOrElse("?")))
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          // The listener bus may drop a start event under load — a
          // missing entry must not MatchError inside the listener.
          Option(starts.remove(je.jobId)).foreach { case (t0, name) =>
            val sec = (System.nanoTime() - t0) / 1e9
            if (sec > 0.2)
              // Locale.ROOT like Bench: comma-decimal locales must not
              // change diagnostic output.
              println(String.format(java.util.Locale.ROOT,
                "  JOB %4d %7.2f s  %s",
                Integer.valueOf(je.jobId), java.lang.Double.valueOf(sec),
                name))
          }
      })
    try {
      SparkEntry.entry(spark).count()
      val t = Tables.load(spark, sfDir)
      Seq(t.region, t.nation, t.customer, t.supplier, t.part, t.orders,
        t.lineitem, t.events, t.documents, t.embeddings)
        .foreach(_.count())
    } catch { case _: Throwable => () }
    // SPARK_GRAFT_EXPLAIN=formatted|extended|codegen dumps each query's
    // plan before timing it — the plan-shape audit loop (PushedFilters,
    // broadcast vs shuffle joins, WholeStageCodegen spans).
    val explain = sys.env.get("SPARK_GRAFT_EXPLAIN")
    // SPARK_GRAFT_TORDD=1 times queryExecution.toRdd.count() — the exact
    // action Bench times — instead of count(), whose aggregate pushdown
    // can plan away count-invariant work and under-measure (q92/q101).
    val toRdd = sys.env.get("SPARK_GRAFT_TORDD").contains("1")
    args.foreach { name =>
      // Construction timed separately from execution: several operators
      // do eager driver-side work when the query FUNCTION runs (state
      // builds, k-means training collects, geometry count jobs) that the
      // bench's single construct+execute wall hides. Note the explain
      // dump itself constructs the frame once more (eta-expansion of
      // .explain evaluates the receiver), warming session caches — use
      // it for plan shape, not for timing.
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tc = (System.nanoTime() - t0) / 1e9
      explain.foreach(df.explain)
      val t1 = System.nanoTime()
      val n = if (toRdd) df.queryExecution.toRdd.count() else df.count()
      println(String.format(java.util.Locale.ROOT,
        "QDEBUG %-30s %8.3f s  (construct %7.3f + execute %7.3f)  rows=%d",
        name, java.lang.Double.valueOf(tc + (System.nanoTime() - t1) / 1e9),
        java.lang.Double.valueOf(tc),
        java.lang.Double.valueOf((System.nanoTime() - t1) / 1e9),
        java.lang.Long.valueOf(n)))
    }
    spark.stop()
  }
}
