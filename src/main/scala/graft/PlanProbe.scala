package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-audit main — NOT part of the driver contract. Prints
  * the formatted physical plan of the MIH hamming pair join and the
  * serve-against-state join at a given corpus, so the plan shape
  * (whole-stage codegen spans, join strategies, exchange keys) can be
  * read directly rather than inferred from walls.
  *
  *   SPARK_GRAFT_SF_DIR=bench/sf1 tools/run.sh graft.PlanProbe
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench/sf1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Tables.load(spark, sfDir).documents
    val sigs = operators.Dedup.simhashes(docs, 60)
    println("==== MIH pair join (60/5) ====")
    operators.Dedup.hammingNearPairs(sigs, "doc_id", "simhash", 60, 5)
      .explain("formatted")
    println("==== MIH serve join (60/5, 200-doc batch) ====")
    operators.Dedup.simhashNearDupsFromState(sigs,
        docs.filter($"doc_id" < 200), 5, bits = 60)
      .explain("formatted")
    spark.stop()
  }
}
