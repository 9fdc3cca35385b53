package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch recall probe for the PQ ANN family — NOT part of the driver
  * contract. Measures recall@k of the compressed-code retrieval paths
  * (flat PQ q87, IVF-PQ q94, and their refined variants q97/q98) against
  * the exact brute-force top-k (q37's operator) on the clustered
  * near-dup corpora (tools/gen_emb_clustered.py), where planted
  * duplicates give the ranking a realistic shape. The r11 verdict's
  * task 1: the LSH family carries measured recall (0.991/0.993); this
  * closes the same gap for the PQ family and quantifies what the
  * refine stage buys back.
  *
  *   SPARK_GRAFT_SF_DIR=bench/embc1 tools/run.sh graft.RecallProbe
  *
  * recall@k = |approx∩exact| / |exact| over all (qid, nid) pairs of the
  * first nQueries queries; both sides are deterministic so the number
  * is exact, not sampled. Result sets are nQueries·k rows — the
  * collects are bounded by construction, not corpus-sized.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench/embc0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nq = sys.env.getOrElse("SPARK_GRAFT_NQ", "100").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_K", "3").toInt
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
    emb.count() // warm scan

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    def s3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", v)

    val exact = pairs(operators.Similarity.cosineTopK(emb, nq, k))
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "pq" -> (() => operators.Similarity.cosineTopKPq(emb, nq, k)),
      "ivfpq" -> (() => operators.Similarity.cosineTopKIvfPq(emb, nq, k)),
      "pq_refined" -> (() =>
        operators.Similarity.cosineTopKPqRefined(emb, nq, k)),
      "ivfpq_refined" -> (() =>
        operators.Similarity.cosineTopKIvfPqRefined(emb, nq, k)))
    variants.foreach { case (name, thunk) =>
      val t0 = System.nanoTime()
      val got = pairs(thunk())
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = (got & exact).size.toDouble / exact.size
      println(s"RECALLPROBE dir=$sfDir variant=$name nq=$nq k=$k " +
        s"recall=${s3(recall)} sec=${s3(sec)} pairs=${got.size}")
    }
    spark.stop()
  }
}
