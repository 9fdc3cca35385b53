package graft

import org.apache.spark.sql.SparkSession

/** Scratch scale-probe main for BATCH-sized near-dup serving — NOT part
  * of the driver contract. Builds [[operators.Similarity.ivfIndex]] at
  * an arg-given nlist on the corpus, then serves the first `batch` rows
  * as the incoming batch at a realistic dup threshold (cos >= 0.8).
  * This is the probe side the hier-probe OPT-IN exists for: a
  * corpus-sized batch pays nlist·dims probe dots per row under the flat
  * probe, and the serve task's target is dup-recall, not bulk ranking.
  *
  *   SPARK_GRAFT_SF_DIR=bench/embc10 tools/run.sh graft.ServeProbe 8192 100000 4
  *   SPARK_GRAFT_SF_DIR=bench/embc10 EXTRA_JVM="-Dgraft.hier.probe.min.lists=4096" \
  *     tools/run.sh graft.ServeProbe 8192 100000 4
  */
object ServeProbe {
  def main(args: Array[String]): Unit = {
    val nlist = if (args.length > 0) args(0).toInt else 8192
    val batch = if (args.length > 1) args(1).toInt else 100000
    val nprobe = if (args.length > 2) args(2).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench/embc10")
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
    val emb = Tables.load(spark, sfDir).embeddings
    emb.count() // warm scan
    val t0 = System.nanoTime()
    val (cents, assigned) = operators.Similarity.ivfIndex(emb, nlist,
      iters = 2, trainFrac = 0.125)
    assigned.queryExecution.toRdd.count()
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val pairs = operators.Similarity.cosineNearDupsFromIndex(cents,
      assigned, emb.filter($"vec_id" < batch), 0.8, nprobe)
    val nPairs = pairs.queryExecution.toRdd.count()
    val tServe = (System.nanoTime() - t1) / 1e9
    println(String.format(java.util.Locale.ROOT,
      "SERVEPROBE dir=%s nlist=%d batch=%d nprobe=%d build=%.3f serve=%.3f pairs=%d",
      sfDir, Integer.valueOf(nlist), Integer.valueOf(batch),
      Integer.valueOf(nprobe), java.lang.Double.valueOf(tBuild),
      java.lang.Double.valueOf(tServe), java.lang.Long.valueOf(nPairs)))
    spark.stop()
  }
}
