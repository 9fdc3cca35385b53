package graft

import org.apache.spark.sql.SparkSession

/** Scratch scale-probe main for the clustered-embedding corpora
  * (tools/gen_emb_clustered.py) — NOT part of the driver contract.
  *
  * Runs [[operators.Similarity.cosineNearDupsAuto]] at a REALISTIC
  * near-dup threshold (cos >= 0.8, far above the 64-dim random-cosine
  * bulk) against `SPARK_GRAFT_SF_DIR`, printing the auto-chosen geometry,
  * wall seconds, and output rows — the numbers bench/bench_r10_sf1.json
  * records at 1× and 10× scale to close the r9 q59 caveat (iid data made
  * cos>=0.35 output quadratic; this measures the linear-output regime the
  * operator is actually for).
  *
  *   SPARK_GRAFT_SF_DIR=bench/embc1 tools/run.sh graft.EmbProbe
  */
object EmbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench/embc0.1")
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
    val emb = Tables.load(spark, sfDir).embeddings
    val n = emb.count() // warm scan; also the count Auto re-derives
    val (b, p) = operators.Similarity.lshParams(n, 0.8)
    val t0 = System.nanoTime()
    val rows = operators.Similarity.cosineNearDupsAuto(emb, 0.8).count()
    val sec = (System.nanoTime() - t0) / 1e9
    // Locale.ROOT like Bench: comma-decimal locales must not change output.
    def s3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)
    println(s"EMBPROBE dir=$sfDir n=$n geom=($b,$p) " +
      s"sec=${s3(sec)} rows=$rows")
    // Cluster closure at the same geometry: rides the pair/band caches
    // the run above materialized, so this delta isolates closure cost.
    val t1 = System.nanoTime()
    val kept = operators.Similarity
      .cosineNearDupClusters(emb, 0.8, b, p)
      .filter(org.apache.spark.sql.functions.col("keep")).count()
    val csec = (System.nanoTime() - t1) / 1e9
    println(s"EMBPROBE-CLUSTERS dir=$sfDir n=$n sec=${s3(csec)} keep=$kept")
    spark.stop()
  }
}
