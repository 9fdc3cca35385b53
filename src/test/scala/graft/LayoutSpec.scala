package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Storage-layout scale mechanics: bucketing eliminates the join shuffle,
  * partitioning prunes the scan. These are the two levers that make the
  * 100 TB story concrete (SCALE.md §Joins/§Scans); asserted on real plans.
  */
class LayoutSpec extends SparkSpec {

  test("bucketed tables join without any exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // A previously-failed run can leave the managed locations behind
    // without catalog entries; saveAsTable refuses to reuse them.
    Seq("li_b", "ord_b").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(d)
      }
    }
    tables.lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_b")
    tables.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_b")
    // Force the shuffle-join path (the small side would auto-broadcast at
    // test scale, hiding the bucketing benefit under test).
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b").join(spark.table("ord_b"),
        col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      assert(joined.count() == tables.lineitem
        .join(tables.orders, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("hive-partitioned layout prunes non-matching partitions at scan") {
    import spark.implicits._
    val dir = Files.createTempDirectory("parts").toString
    tables.events
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val one = spark.read.parquet(dir).filter($"day" === "2024-01-02")
    one.collect()
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(day"),
      s"no partition pruning:\n$plan")
    // And the pruned read returns exactly that day's rows.
    val expect = tables.events
      .filter(date_format($"ts", "yyyy-MM-dd") === "2024-01-02").count()
    assert(one.count() == expect)
  }
}
