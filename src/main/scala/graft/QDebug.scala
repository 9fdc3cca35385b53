package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the driver contract). */
object QDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, sf).documents
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    t("warm scan")(docs.count())
    t("lsh candidates")(operators.Dedup.lshCandidateCount(docs))
    t("full q26")(operators.Dedup.jaccardNearDups(docs, 0.6).count())
    t("full q27")(operators.Dedup.lshNearDups(docs, 0.9).count())
    t("full q28")(operators.Dedup.simhashes(docs).count())
    t("full q47")(operators.Dedup.simhashNearPairs(docs, 1).count())
    t("q26 again (cached)")(operators.Dedup.jaccardNearDups(docs, 0.6).count())
    spark.stop()
  }
}
