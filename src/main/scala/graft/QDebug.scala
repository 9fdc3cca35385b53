package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling/diagnosis main (not part of the driver contract).
  *
  * Current use: characterize Spark's approx_percentile rank choice at
  * n < accuracy (sketch retains all samples) to decide whether q71/q72
  * can carry exact DuckDB oracles at sf0.01.
  */
object QDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      println(s"=== $sf")
      val t = Tables.load(spark, sf)
      val approx = operators.Reporting.medianPriceApprox(t.orders).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val cs = t.orders.select($"o_orderpriority",
          graft.functions.Fp.cents($"o_totalprice").as("c")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
        .map { case (p, xs) => p -> xs.map(_._2).sorted }
      cs.toSeq.sortBy(_._1).foreach { case (p, arr) =>
        val n = arr.length
        val v = math.round(approx(p) * 100)
        val idx = arr.indexOf(v)
        // candidate rank formulas (1-based)
        val lower = (n + 1) / 2            // ceil(n/2): exact lower median
        val floorHalf = n / 2
        val interp = 1 + ((n - 1) * 0.5).toInt
        println(f"$p%-10s n=$n%5d approxRank1=${idx + 1}%5d lower=$lower floor=$floorHalf interp=$interp  v=$v")
      }
      // p95 on documents per source
      val ap95 = operators.Reporting.lengthOutliersApprox(t.documents)
        .select($"source", $"p95").distinct().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val ls = t.documents.select($"source", $"n_chars").collect()
        .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
        .map { case (s, xs) => s -> xs.map(_._2).sorted }
      ls.toSeq.sortBy(_._1).foreach { case (s, arr) =>
        val n = arr.length
        val v = ap95(s)
        val idx = arr.indexOf(v)
        val ceilR = math.ceil(n * 0.95).toInt
        val interp = 1 + ((n - 1) * 0.95).toInt
        println(f"$s%-10s n=$n%5d approxRank1=${idx + 1}%5d ceil=$ceilR interp=$interp v=$v")
      }
    }
    spark.stop()
  }
}
