package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fp._

/** Pairing joins with fallback semantics and per-bucket report lists
  * (reference J2 pairs-file join with missing-mask fallback at
  * /root/reference/experiments/standard_vton/dataloader.py:197-223, and
  * A4 categorized report with per-bucket entry lists at
  * test_website_accessibility.py:449-505).
  */
object Pairing {

  /** J2: pair list (fact side) equi-joined to two dimensions with
    * left-outer + coalesce defaults — missing names fall back to a
    * sentinel instead of dropping the pair.
    */
  def pairsWithFallback(li: DataFrame, part: DataFrame,
      supplier: DataFrame): DataFrame = {
    import li.sparkSession.implicits._
    // Restrict the pair list; shift some keys out of range so the
    // fallback path is exercised (the reference's missing-pairs mask).
    val pairs = li.filter($"l_orderkey" < 100)
      .select($"l_orderkey", $"l_linenumber",
        when($"l_linenumber" % 3 === 0, -$"l_partkey" - 1)
          .otherwise($"l_partkey").as("pk"),
        $"l_suppkey")
    pairs
      .join(part, pairs("pk") === part("p_partkey"), "left_outer")
      .join(supplier, pairs("l_suppkey") === supplier("s_suppkey"), "left_outer")
      .select($"l_orderkey", $"l_linenumber",
        coalesce($"p_name", lit("<missing>")).as("part_name"),
        coalesce($"s_name", lit("<missing>")).as("supp_name"))
  }

  /** A4: bucketed report with a bounded, deterministically-sorted list of
    * example ids per bucket (sort_array before slice — collect_list alone
    * has no order guarantee in a distributed run).
    */
  def bucketReport(orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    orders
      .withColumn("bucket",
        when($"o_totalprice" < 50000.0, "small")
          .when($"o_totalprice" < 150000.0, "medium")
          .otherwise("large"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        // Stringified: the driver's oracle comparator can't hash array
        // cells, so the bounded example list ships as a CSV string.
        array_join(transform(
          slice(sort_array(collect_list($"o_orderkey")), 1, 5),
          _.cast("string")), ",").as("example_ids"))
  }

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q43_pairs_fallback" -> ((s, d) => {
      val t = Tables.load(s, d); pairsWithFallback(t.lineitem, t.part, t.supplier)
    }),
    "q44_bucket_report" -> ((s, d) => bucketReport(Tables.load(s, d).orders))
  )

  def oracles: Map[String, String] = Map(
    "q43_pairs_fallback" ->
      """SELECT l_orderkey, l_linenumber,
        |  COALESCE(p_name, '<missing>') AS part_name,
        |  COALESCE(s_name, '<missing>') AS supp_name
        |FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_linenumber % 3 = 0 THEN -l_partkey - 1 ELSE l_partkey END AS pk,
        |    l_suppkey
        |  FROM lineitem WHERE l_orderkey < 100) pairs
        |LEFT OUTER JOIN part ON pairs.pk = p_partkey
        |LEFT OUTER JOIN supplier ON pairs.l_suppkey = s_suppkey""".stripMargin,
    "q44_bucket_report" ->
      """SELECT bucket, COUNT(*) AS n,
        |  array_to_string(list_sort(list(o_orderkey))[1:5], ',') AS example_ids
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_totalprice < CAST(50000 AS DOUBLE) THEN 'small'
        |             WHEN o_totalprice < CAST(150000 AS DOUBLE) THEN 'medium'
        |             ELSE 'large' END AS bucket
        |      FROM orders)
        |GROUP BY bucket""".stripMargin
  )
}
