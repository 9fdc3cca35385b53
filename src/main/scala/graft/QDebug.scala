package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object QDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sf = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, sf).documents
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-26s wall=${(System.nanoTime() - t0) / 1e9}%6.2f s  ($n rows)")
    }
    // Pre-warm the shared indexes exactly as q26 would.
    t("q26 (warms sh+sets)")(operators.Dedup.jaccardNearDups(docs, 0.6).count())
    val sh = docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks", posexplode($"toks").as(Seq("i", "w")))
      .filter($"i" <= size($"toks") - 3)
      .select($"doc_id", graft.functions.Fp.hash60(concat_ws(" ", $"w",
        element_at($"toks", $"i" + 2), element_at($"toks", $"i" + 3))).as("s64"))
      .distinct()
    t("sh scan (should be cached)")(sh.count())
    val sig = operators.Dedup.minhashSignatures(sh, 64)
    t("sig agg")(sig.count())
    t("sig agg again")(sig.count())
    val banded = sig.select($"doc_id", explode(
      transform(sequence(lit(0), lit(15)), b =>
        struct(b.as("band"),
          xxhash64(concat_ws(",", slice($"sig", b * 4 + 1, lit(4)))).as("bh")))).as("bb"))
      .select($"doc_id", col("bb.band").as("band"), col("bb.bh").as("bh")).persist()
    t("banded materialize")(banded.count())
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    t("band join raw")(cand.count())
    t("band join distinct")(cand.distinct().count())
    t("full q27")(operators.Dedup.lshNearDups(docs, 0.9).count())
    spark.stop()
  }
}
