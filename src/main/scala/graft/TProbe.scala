package graft
import org.apache.spark.sql.SparkSession
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
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"TP $tag%-34s ${(System.nanoTime()-t0)/1e9}%8.3f s"); r
    }
    val tbl = Tables.load(spark, sfDir)
    tbl.documents.count(); tbl.embeddings.count()
    val st = t("buildState (eager train)") {
      operators.IngestGate.buildState(tbl.documents, tbl.embeddings) }
    val dir = java.nio.file.Files.createTempDirectory("tp106").toString
    t("saveState (parallel writes)") {
      operators.IngestGate.saveState(st, s"$dir/state") }
    // second build+save in the warm session (bench-like for a serve loop)
    val st2 = t("buildState warm") {
      operators.IngestGate.buildState(tbl.documents, tbl.embeddings) }
    t("saveState warm") {
      operators.IngestGate.saveState(st2, s"$dir/state2") }
    spark.stop()
  }
}
