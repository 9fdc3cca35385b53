package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fp._

/** Core relational surface: aggregation, joins (broadcast / semi / anti /
  * cross), windows, top-k, set ops, conditional buckets, string/JSON scalar
  * functions — the general query layer the reference drives through ad-hoc
  * Python dict manipulation (SURVEY.md §2.3, §2.7–§2.10).
  *
  * Scale notes (100 TB):
  *  - dimension joins ([[q04]]) broadcast the small side explicitly;
  *  - fact-side filters are plain column predicates so Catalyst pushes
  *    them into the parquet scan (verified via explain: PushedFilters);
  *  - aggregations are hash aggregates with map-side partial combine —
  *    exact integer-cents sums keep partial-merge order irrelevant;
  *  - per-group top-k uses window row_number (one shuffle on the group
  *    key), never a driver-side collect.
  */
object Relational {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary (reference A1/A2 run-statistics shape:
    * /root/reference/test_kimono.py:65-76,732-781).
    */
  def pricingSummary(li: DataFrame): DataFrame = {
    import li.sparkSession.implicits._
    li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity".cast("long")).as("sum_qty"),
        sumFixed($"l_extendedprice", 100).as("sum_base_price"),
        sumFixed($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000)
          .as("sum_disc_price"),
        sumFixed(
          $"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"),
          1000000).as("sum_charge"),
        sum(cents($"l_discount")).as("sum_disc_cents"),
        count(lit(1)).as("count_order"))
      .select(
        $"l_returnflag", $"l_linestatus", $"sum_qty", $"sum_base_price",
        $"sum_disc_price", $"sum_charge",
        ($"sum_qty".cast("double") / $"count_order").as("avg_qty"),
        ($"sum_base_price" / $"count_order").as("avg_price"),
        ($"sum_disc_cents".cast("double") / 100.0 / $"count_order").as("avg_disc"),
        $"count_order")
  }

  /** Selective scan: predicate + projection pushdown (reference F1-F10
    * quality filters, e.g. /root/reference/data_pipeline/utils/image_utils.py:24-29).
    */
  def selectiveScan(li: DataFrame): DataFrame = {
    import li.sparkSession.implicits._
    li.filter(
        $"l_shipdate" >= lit("1995-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1996-01-01").cast("timestamp") &&
        $"l_discount" >= 0.02 && $"l_discount" <= 0.06 &&
        $"l_quantity" < 24.0)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
  }

  /** 3-way join + grouped revenue + deterministic top-k (TPC-H Q3 shape). */
  def topRevenueOrders(customer: DataFrame, orders: DataFrame, li: DataFrame,
      k: Int = 10): DataFrame = {
    import li.sparkSession.implicits._
    li.join(orders.filter($"o_orderdate" < lit("1998-01-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(customer.filter($"c_mktsegment" === "MACHINERY"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey")
      .agg(sumFixed($"l_extendedprice" * (lit(1.0) - $"l_discount"), 10000)
        .as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey".asc)
      .limit(k)
  }

  /** Broadcast-dimension rollup: region ⋈ nation ⋈ customer. */
  def regionRollup(region: DataFrame, nation: DataFrame,
      customer: DataFrame): DataFrame = {
    import region.sparkSession.implicits._
    customer
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        countDistinct($"n_nationkey").as("n_nations"),
        count(lit(1)).as("n_customers"),
        sumFixed($"c_acctbal", 100).as("total_acctbal"))
  }

  /** Left-semi join (EXISTS): orders having any heavy line. */
  def ordersWithHeavyLines(orders: DataFrame, li: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    orders
      .join(li.filter($"l_quantity" >= 48.0).select($"l_orderkey"),
        $"o_orderkey" === $"l_orderkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
  }

  /** Left-anti join (NOT EXISTS): the reference's resume/dedup primitive
    * (D2-D4, /root/reference/data_pipeline/scrapers/any_scraper.py:585-597).
    */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame = {
    import customer.sparkSession.implicits._
    customer.join(
        orders.filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1996-01-01").cast("timestamp"))
          .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
  }

  /** Per-group top-k via window row_number (reference R3 caps,
    * /root/reference/data_pipeline/core/pipeline_orchestrator.py:135-149).
    */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame = {
    import orders.sparkSession.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    orders
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rk")
  }

  /** Running total window (reference R2 global counters,
    * /root/reference/data_pipeline/zalando_gallery_scraper_s3.py:448-470).
    */
  def runningQuantity(li: DataFrame): DataFrame = {
    import li.sparkSession.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.filter($"l_suppkey" < 10)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        sum($"l_quantity".cast("long")).over(w).as("run_qty"))
  }

  /** Distinct projection (reference D1/D5 dedup-on-extract). */
  def distinctBrandTypes(part: DataFrame): DataFrame =
    part.select("p_brand", "p_type").distinct()

  /** Deterministic global top-k (reference R3). */
  def topOrders(orders: DataFrame, k: Int = 10): DataFrame = {
    import orders.sparkSession.implicits._
    orders.orderBy($"o_totalprice".desc, $"o_orderkey".asc).limit(k)
  }

  /** Set difference (reference R7, /root/reference/scraper/medium_sampler.py:33). */
  def lapsedCustomers(orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    def active(y: Int) = orders
      .filter($"o_orderdate" >= lit(s"$y-01-01").cast("timestamp") &&
        $"o_orderdate" < lit(s"${y + 1}-01-01").cast("timestamp"))
      .select($"o_custkey")
    active(1995).distinct().except(active(1996).distinct())
  }

  /** CASE-WHEN bucket report (reference A4/T9,
    * /root/reference/data_pipeline/tests/test_website_accessibility.py:449-505).
    */
  def orderSizeBuckets(orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    orders
      .withColumn("bucket",
        when($"o_totalprice" < 50000.0, "small")
          .when($"o_totalprice" < 150000.0, "medium")
          .otherwise("large"))
      .groupBy($"bucket")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when($"o_orderpriority" === "1-URGENT", 1L).otherwise(0L))
          .as("n_urgent"))
  }

  /** String/regex scalar surface (reference T1-T4 extraction cascades,
    * /root/reference/data_pipeline/scrapers/any_scraper.py:161-265).
    */
  def partNameFeatures(part: DataFrame): DataFrame = {
    import part.sparkSession.implicits._
    part.select(
      $"p_partkey",
      regexp_extract($"p_name", "^([a-z]+)", 1).as("first_word"),
      length($"p_name").cast("long").as("name_len"),
      regexp_extract($"p_brand", "([0-9]+)", 1).cast("long").as("brand_num"),
      regexp_replace(lower($"p_type"), "[^a-z0-9]+", "_").as("clean_type"),
      upper(substring($"p_name", 1, 3)).as("prefix3"))
  }

  /** JSON extraction (reference T13/T14,
    * /root/reference/data_pipeline/models/qwen_vl_processor.py:175-187).
    */
  def eventPropsSummary(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select($"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        max($"k").as("max_k"))
  }

  /** Exact-arithmetic mean/stddev (reference A8 metric stats,
    * /root/reference/experiments/standard_vton/metrics.py:341-345). All
    * aggregates are exact integers (or exactly-representable doubles), so
    * the final float math is a single deterministic expression — merge
    * order of distributed partials cannot change the result.
    */
  def eventValueStats(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .select($"event_type", cents($"value").as("c"))
      .groupBy($"event_type")
      // Decimal (not double) sum of squares: at 100 TB the partial sums
      // pass 2^53 and double addition stops being exact/order-independent;
      // the exact decimal sum rounds to double exactly once at the end.
      .agg(count(lit(1)).as("n"), sum($"c").as("sum_c"),
        sum($"c".cast("decimal(38,0)") * $"c").as("sumsq_d"))
      .select(
        $"event_type", $"n", $"sum_c",
        $"sumsq_d".cast("double").as("sumsq"))
      .select(
        $"event_type", $"n",
        ($"sum_c".cast("double") / 100.0).as("sum_value"),
        ($"sum_c".cast("double") / 100.0 / $"n").as("avg_value"),
        (sqrt($"sumsq" / $"n" -
          ($"sum_c".cast("double") / $"n") * ($"sum_c".cast("double") / $"n"))
          / 100.0).as("std_value"))
  }

  /** Histogram with global share via an unpartitioned window (reference A3,
    * /root/reference/data_pipeline/tests/test_website_accessibility.py:391-447).
    */
  def eventTypeHistogram(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.groupBy($"event_type").agg(count(lit(1)).as("n"))
      .withColumn("share",
        $"n".cast("double") / sum($"n").over(Window.partitionBy()))
  }

  /** Deterministic arg-max per group (reference A12,
    * /root/reference/data_pipeline/scrapers/any_scraper.py:361-368): window
    * formulation so tie-breaks are total-ordered, unlike raw max_by.
    */
  def topEventPerType(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"event_type")
      .orderBy($"value".desc, $"event_id".asc)
    events.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"event_type", $"event_id", $"value")
  }

  /** Capped cross-join pairing (reference J1 person×cloth,
    * /root/reference/experiments/standard_vton/dataloader.py:83-92).
    */
  def cappedPairs(part: DataFrame, supplier: DataFrame): DataFrame = {
    import part.sparkSession.implicits._
    part.filter($"p_partkey" < 5).select($"p_partkey", $"p_name")
      .crossJoin(supplier.filter($"s_suppkey" < 3).select($"s_suppkey", $"s_name"))
  }

  // -------------------------------------------------------------------
  // Driver bindings: query name -> (spark, sfDir) => DataFrame, + oracle.
  // -------------------------------------------------------------------

  def queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> ((s, d) => pricingSummary(Tables.load(s, d).lineitem)),
    "q02_selective_scan" -> ((s, d) => selectiveScan(Tables.load(s, d).lineitem)),
    "q03_top_revenue_orders" -> ((s, d) => {
      val t = Tables.load(s, d); topRevenueOrders(t.customer, t.orders, t.lineitem)
    }),
    "q04_region_rollup" -> ((s, d) => {
      val t = Tables.load(s, d); regionRollup(t.region, t.nation, t.customer)
    }),
    "q05_semi_join" -> ((s, d) => {
      val t = Tables.load(s, d); ordersWithHeavyLines(t.orders, t.lineitem)
    }),
    "q06_anti_join" -> ((s, d) => {
      val t = Tables.load(s, d); customersWithoutOrders(t.customer, t.orders)
    }),
    "q07_top_orders_per_customer" -> ((s, d) =>
      topOrdersPerCustomer(Tables.load(s, d).orders)),
    "q08_running_quantity" -> ((s, d) => runningQuantity(Tables.load(s, d).lineitem)),
    "q09_distinct_brand_types" -> ((s, d) => distinctBrandTypes(Tables.load(s, d).part)),
    "q10_top_orders" -> ((s, d) => topOrders(Tables.load(s, d).orders)),
    "q11_lapsed_customers" -> ((s, d) => lapsedCustomers(Tables.load(s, d).orders)),
    "q12_order_buckets" -> ((s, d) => orderSizeBuckets(Tables.load(s, d).orders)),
    "q13_part_name_features" -> ((s, d) => partNameFeatures(Tables.load(s, d).part)),
    "q14_event_props_json" -> ((s, d) => eventPropsSummary(Tables.load(s, d).events)),
    "q15_event_value_stats" -> ((s, d) => eventValueStats(Tables.load(s, d).events)),
    "q16_event_histogram" -> ((s, d) => eventTypeHistogram(Tables.load(s, d).events)),
    "q17_top_event_per_type" -> ((s, d) => topEventPerType(Tables.load(s, d).events)),
    "q18_capped_pairs" -> ((s, d) => {
      val t = Tables.load(s, d); cappedPairs(t.part, t.supplier)
    }),
    // SQL front-end surface: the same engine through spark.sql over temp
    // views (what a reference user would type interactively).
    "q46_sql_surface" -> ((s, d) => {
      Tables.load(s, d).lineitem.createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag,
          |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS base_cents,
          |  COUNT(*) AS n
          |FROM lineitem_v GROUP BY l_returnflag""".stripMargin)
    })
  )

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
         |  ${sumFixedSql("l_extendedprice", 100)} AS sum_base_price,
         |  ${sumFixedSql("l_extendedprice * (1.0 - l_discount)", 10000)} AS sum_disc_price,
         |  ${sumFixedSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 1000000)} AS sum_charge,
         |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  ${sumFixedSql("l_extendedprice", 100)} / COUNT(*) AS avg_price,
         |  CAST(SUM(${centsSql("l_discount")}) AS BIGINT) / 100.0 / COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_selective_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount >= CAST(0.02 AS DOUBLE) AND l_discount <= CAST(0.06 AS DOUBLE)
        |  AND l_quantity < CAST(24 AS DOUBLE)""".stripMargin,
    "q03_top_revenue_orders" ->
      s"""SELECT l_orderkey,
         |  ${sumFixedSql("l_extendedprice * (1.0 - l_discount)", 10000)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE o_orderdate < TIMESTAMP '1998-01-01' AND c_mktsegment = 'MACHINERY'
         |GROUP BY l_orderkey
         |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,
    "q04_region_rollup" ->
      s"""SELECT r_name,
         |  COUNT(DISTINCT n_nationkey) AS n_nations,
         |  COUNT(*) AS n_customers,
         |  ${sumFixedSql("c_acctbal", 100)} AS total_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= CAST(48 AS DOUBLE))
        |GROUP BY o_orderpriority""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01')""".stripMargin,
    "q07_top_orders_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "q08_running_quantity" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_qty
        |FROM lineitem WHERE l_suppkey < 10""".stripMargin,
    "q09_distinct_brand_types" ->
      "SELECT DISTINCT p_brand, p_type FROM part",
    "q10_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q11_lapsed_customers" ->
      """SELECT DISTINCT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'""".stripMargin,
    "q12_order_buckets" ->
      """SELECT bucket, COUNT(*) AS n_orders,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
        |FROM (SELECT o_orderpriority,
        |        CASE WHEN o_totalprice < CAST(50000 AS DOUBLE) THEN 'small'
        |             WHEN o_totalprice < CAST(150000 AS DOUBLE) THEN 'medium'
        |             ELSE 'large' END AS bucket
        |      FROM orders)
        |GROUP BY bucket""".stripMargin,
    "q13_part_name_features" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
        |  regexp_replace(lower(p_type), '[^a-z0-9]+', '_', 'g') AS clean_type,
        |  upper(substr(p_name, 1, 3)) AS prefix3
        |FROM part""".stripMargin,
    "q14_event_props_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "q15_event_value_stats" ->
      s"""SELECT event_type, n,
         |  CAST(sum_c AS DOUBLE) / 100.0 AS sum_value,
         |  CAST(sum_c AS DOUBLE) / 100.0 / n AS avg_value,
         |  sqrt(sumsq / n - (CAST(sum_c AS DOUBLE) / n) * (CAST(sum_c AS DOUBLE) / n)) / 100.0 AS std_value
         |FROM (
         |  SELECT event_type, COUNT(*) AS n,
         |    CAST(SUM(${centsSql("value")}) AS BIGINT) AS sum_c,
         |    CAST(SUM(CAST(${centsSql("value")} AS HUGEINT) * ${centsSql("value")}) AS DOUBLE) AS sumsq
         |  FROM events GROUP BY event_type)""".stripMargin,
    "q16_event_histogram" ->
      """SELECT event_type, n, CAST(n AS DOUBLE) / SUM(n) OVER () AS share
        |FROM (SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type)""".stripMargin,
    "q17_top_event_per_type" ->
      """SELECT event_type, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id ASC) AS rk
        |  FROM events) WHERE rk = 1""".stripMargin,
    "q18_capped_pairs" ->
      """SELECT p_partkey, p_name, s_suppkey, s_name
        |FROM part CROSS JOIN supplier
        |WHERE p_partkey < 5 AND s_suppkey < 3""".stripMargin,
    "q46_sql_surface" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS base_cents,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
