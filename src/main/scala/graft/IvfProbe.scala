package graft

import org.apache.spark.sql.SparkSession

/** Scratch scale-probe main for IVF training cost — NOT part of the
  * driver contract. The driver-gate geometry (nlist=16, iters=2) keeps
  * Lloyd's share of the build tiny, so q51-vs-q80 wall deltas mostly
  * measure fixed stage costs; this main takes the geometry from args so
  * the training-dominant regime (large nlist × iters, the realistic
  * 100 TB index shape: FAISS-style nlist ≈ sqrt(n) and beyond) is
  * measurable on the same corpora.
  *
  *   SPARK_GRAFT_SF_DIR=bench/sf1 tools/run.sh graft.IvfProbe 64 8 1.0
  *   SPARK_GRAFT_SF_DIR=bench/sf1 tools/run.sh graft.IvfProbe 64 8 0.125
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val nlist = if (args.length > 0) args(0).toInt else 64
    val iters = if (args.length > 1) args(1).toInt else 8
    val frac = if (args.length > 2) args(2).toDouble else 1.0
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
    val emb = Tables.load(spark, sfDir).embeddings
    val n = emb.count() // warm scan, as in Bench/TextProbe
    // Optional 4th arg: nprobe (default 4). 5th arg "recall": nq=100
    // queries, compare against exact brute force — the hier-assignment
    // quality check (approximate assignment ~ slightly smaller
    // effective nprobe; measure it, don't argue it).
    val nprobe = if (args.length > 3) args(3).toInt else 4
    val doRecall = args.length > 4 && args(4) == "recall"
    val nq = if (doRecall) 100 else 10
    val t0 = System.nanoTime()
    val res = operators.Similarity
      .cosineTopKIvf(emb, nq, 3, nlist, nprobe, iters, frac)
    val (rows, recallStr) =
      if (doRecall) {
        val got = res.select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val exact = operators.Similarity.cosineTopK(emb, nq, 3)
          .select("qid", "nid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (got.size.toLong, String.format(java.util.Locale.ROOT,
          " recall=%.3f", java.lang.Double.valueOf(
            (got & exact).size.toDouble / exact.size)))
      } else (res.count(), "")
    val sec = (System.nanoTime() - t0) / 1e9
    // Locale.ROOT like Bench: comma-decimal locales must not change output.
    println(String.format(java.util.Locale.ROOT,
      "IVFPROBE dir=%s n=%d nlist=%d iters=%d frac=%s nprobe=%d sec=%.3f rows=%d%s",
      sfDir, java.lang.Long.valueOf(n), Integer.valueOf(nlist),
      Integer.valueOf(iters), frac.toString, Integer.valueOf(nprobe),
      java.lang.Double.valueOf(sec), java.lang.Long.valueOf(rows),
      recallStr))
    spark.stop()
  }
}
