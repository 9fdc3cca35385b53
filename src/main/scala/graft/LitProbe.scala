package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe: per-row lookup cost through a nested typedlit
  * vs a single Literal.create ArrayData (Similarity.lit2dLong). NOT part
  * of the driver contract.
  */
object LitProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val table: Seq[Seq[Long]] =
      (0 until 256).map(i => (0 until 64).map(j => (i * 64 + j).toLong))
    val litCreate = org.apache.spark.sql.GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(table,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType))))
    val df = spark.range(2000000).select(($"id" % 256).as("k"))
    df.queryExecution.toRdd.count()
    for (round <- 1 to 2) {
      var t0 = System.nanoTime()
      df.select(element_at(element_at(typedlit(table),
          ($"k" + 1).cast("int")), 5).as("x"))
        .queryExecution.toRdd.count()
      println(f"round$round typedlit  ${(System.nanoTime() - t0) / 1e9}%.3f")
      t0 = System.nanoTime()
      df.select(element_at(element_at(litCreate,
          ($"k" + 1).cast("int")), 5).as("x"))
        .queryExecution.toRdd.count()
      println(f"round$round litcreate ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
