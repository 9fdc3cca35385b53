package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    val emb = Tables.load(spark, sf).embeddings
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    import spark.implicits._

    // q26 stage decomposition
    val sh = {
      val withNext = docs
        .select($"doc_id", split($"text", " ").as("toks"))
        .select($"doc_id", $"toks", posexplode($"toks").as(Seq("i", "w")))
        .filter($"i" <= size($"toks") - 3)
        .withColumn("w1", element_at($"toks", $"i" + 2))
        .withColumn("w2", element_at($"toks", $"i" + 3))
      withNext.select($"doc_id", xxhash64($"w", $"w1", $"w2").as("s64"))
        .distinct().persist()
    }
    t("index build")(sh.count())
    val minJ = 0.6
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val dfreq = sh.groupBy($"s64").agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy($"doc_id").orderBy($"df".asc, $"s64".asc)
    val prefix = sh.join(dfreq, "s64").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(wRank))
      .filter($"rn" <= $"n" - ceil(lit(minJ) * $"n") + 1)
      .select($"doc_id", $"s64", $"n").persist()
    t("prefix build")(prefix.count())
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s64") === col("y.s64") && col("x.doc_id") < col("y.doc_id") &&
          least(col("x.n"), col("y.n")).cast("double") >=
            lit(minJ) * greatest(col("x.n"), col("y.n")))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct().persist()
    t("candidates")(cand.count())
    val ver = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") &&
        col("sa.s64") === col("sb.s64"))
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("c"))
    t("verify")(ver.count())
    t("full q26")(operators.Dedup.jaccardNearDups(docs, 0.6).count())
    t("full q59")(operators.Similarity.cosineNearDups(emb, 0.35).count())
    spark.stop()
  }
}
