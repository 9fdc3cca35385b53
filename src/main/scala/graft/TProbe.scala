package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
/** Scratch r17 piece-wise probe (not driver contract). */
object TProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Tables.load(spark, sfDir).documents
    docs.count()
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"TP $tag%-34s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
    }
    val maxDf = 100L
    val sh0 = operators.Dedup.shingleIndex(docs)
    sh0.queryExecution.toRdd.count()
    val withDf = sh0.withColumn("df",
      count(lit(1)).over(Window.partitionBy($"s64")))
    val cut = withDf.filter($"df" <= maxDf).persist()
    cut.queryExecution.toRdd.count()
    val ss = cut.select($"doc_id", $"s64").groupBy($"doc_id")
      .agg(sort_array(collect_list($"s64")).as("ss"))
    t("sortedSets run1") { ss.queryExecution.toRdd.count() }
    t("sortedSets run2") { ss.queryExecution.toRdd.count() }
    t("sortedSets run3") { ss.queryExecution.toRdd.count() }
    val nosort = cut.select($"doc_id", $"s64").groupBy($"doc_id")
      .agg(collect_list($"s64").as("ss"))
    t("collect_list only run1") { nosort.queryExecution.toRdd.count() }
    t("collect_list only run2") { nosort.queryExecution.toRdd.count() }
    // from the raw sh0 cache instead of cut
    val ss0 = sh0.groupBy($"doc_id")
      .agg(sort_array(collect_list($"s64")).as("ss"))
    t("sortedSets from sh0 run1") { ss0.queryExecution.toRdd.count() }
    t("sortedSets from sh0 run2") { ss0.queryExecution.toRdd.count() }
    spark.stop()
  }
}
