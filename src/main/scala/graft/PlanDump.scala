package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-capture main — NOT part of the driver contract. Dumps
  * each named query's `.explain("formatted")` text to
  * `<outDir>/<query>_<suffix>.txt` under the SAME session shape as
  * [[Bench]], so the committed plan files reflect exactly the plans the
  * bench runs (the optimization rounds' before/after evidence).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.PlanDump \
  *     plans/r18 after q101_simhash_wide_pairs q26_neardup_jaccard ...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"dumped $name")
    }
    spark.stop()
  }
}
