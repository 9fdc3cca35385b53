package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // 2x cores: slight over-partitioning load-balances skewed task
      // durations across the fixed thread pool; AQE coalesces the
      // many-small-partition cases back down.
      .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Let AQE coalesce INSIDE cached-plan materialization too (off by
      // default): the operator families here are built on session-cached
      // indexes (shingle/prefix/sets tables, quantized corpora, MIH chunk
      // indexes), and without this flag every one of them materializes at
      // the raw shuffle-partition count — 64 tiny sorted partitions each
      // at local[32] — and every consumer scans that many tiny batches.
      // Measured (QDebug, sf0.1, cold): q26 12.9 → 5.8 s, q91 5.5 →
      // 2.0 s at local[32]; it also removes the inverse core-count
      // scaling (16-partition 8-core runs used to BEAT 64-partition
      // 32-core runs on the text family). Scale-safe: AQE sizes cache
      // partitions by bytes (advisoryPartitionSizeInBytes) instead of
      // inheriting a static count — the same policy any cluster wants.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Cached index columns are hashes/quantized values — high-entropy,
      // incompressible; the encoders are pure CPU here (see Verify).
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup (uncounted): pay JVM/codegen/scan-setup cost once so the
    // first measured query isn't charged for it, and touch every bench
    // table once (parquet footer reads, file listing, page cache, scan
    // codegen paths).
    try {
      SparkEntry.entry(spark).count()
      val t = Tables.load(spark, sfDir)
      Seq(t.region, t.nation, t.customer, t.supplier, t.part, t.orders,
        t.lineitem, t.events, t.documents, t.embeddings)
        .foreach(_.count())
    } catch { case _: Throwable => () }
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Label the query's jobs (guide §1.5) so a Spark UI / event-log
      // reading of a bench run attributes stages to queries. Purely
      // cosmetic — timing methodology and output are unchanged.
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      // Execute the query's OWN physical plan (toRdd.count), not a
      // count() over it: count() lets Catalyst drop count-invariant
      // work — a final left join whose right side is provably unique
      // gets eliminated, projection-only expressions get pruned — so a
      // count-timed bench under-measures any query whose expensive part
      // doesn't change the row count (q92's prune join was planned away
      // entirely). toRdd runs the plan Verify materializes to parquet.
      val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
      catch { case _: Throwable => failed += name; false }
      // -1 marks a failure in the numbers themselves; failed queries do
      // not contribute to the total, so a crash can't read as a speedup.
      spark.sparkContext.setJobDescription(null)
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    // Millisecond precision and sorted keys keep the printed line short
    // and its truncation deterministic: the driver's capture keeps a
    // bounded tail of sbt output, so every byte saved is another query
    // that survives into BENCH_r{N}.json, and a sorted map means the
    // surviving subset is the same queries every round.
    val qs = results.toSeq.sortBy(_._1)
      // Locale.ROOT: a comma-decimal default locale (de_DE) would print
      // "1,234" and corrupt the JSON line the driver parses.
      .map { case (k, v) =>
        "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f",
          Double.box(v)) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    // A throwing query must not read as a fast success — surface it.
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // The driver captures only the tail of sbt output, which has truncated
    // past per-query maps — the full line also lands in a file it (and the
    // per-round commit) can read intact.
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.write(java.nio.file.Paths.get("target/bench.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
