package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fp._

/** Report-shaped relational surface: grouping-set rollups, pivoted
  * histograms, consecutive-event deltas, range (non-equi) joins, and exact
  * grouped medians. These extend the reference's statistics/report family
  * (A1-A4 run reports at /root/reference/test_kimono.py:712-782 and
  * test_website_accessibility.py:391-505) with the multi-level and pivoted
  * shapes any dataset-report consumer expects.
  *
  * Scale notes:
  *  - rollup is one shuffle on the finest grouping (Spark expands grouping
  *    sets map-side; partials merge per set) — same cost class as a plain
  *    groupBy;
  *  - pivot with an explicit value list is a single hash aggregate (no
  *    second pass to discover values, which would be a full extra scan);
  *  - the range join broadcasts the literal bucket table — the fact side
  *    never shuffles;
  *  - grouped rank statistics come in pairs: an exact window-rank form
  *    (oracle-testable, parallelism capped at the group-key cardinality)
  *    and an approx_percentile form (one hash aggregate with map-side
  *    sketch merge — no per-key sort, no straggler at 100 TB); the
  *    *Adaptive entry points dispatch on row count.
  */
object Reporting {

  /** Revenue rollup over region → nation grouping sets (subtotals + grand
    * total), names coalesced to a sentinel so every output cell is
    * non-null (array/NULL cells break downstream report consumers).
    */
  def revenueRollup(region: DataFrame, nation: DataFrame, customer: DataFrame,
      orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    orders
      .join(customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_orders"),
        (sum(cents($"o_totalprice")).cast("double") / 100.0).as("revenue"))
      .select(coalesce($"r_name", lit("<all>")).as("region_name"),
        coalesce($"n_name", lit("<all>")).as("nation_name"),
        $"n_orders", $"revenue")
  }

  val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Hour-of-day × event-type pivoted counts via the real pivot API with
    * an explicit value list (one aggregate pass; no value-discovery scan).
    */
  def hourlyTypePivot(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withColumn("hod", (unix_micros($"ts") / 3600000000L % 24).cast("long"))
      .groupBy($"hod")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)
  }

  /** Per-user consecutive-event gaps: exact integer microsecond deltas via
    * lag(), aggregated to count/total/mean (mean is one deterministic
    * division of exact integers).
    */
  def userEventGaps(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us".asc, $"event_id".asc)
    events
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id")
      .withColumn("gap_us", $"us" - lag($"us", 1).over(w))
      .filter($"gap_us".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum($"gap_us").as("total_gap_us"),
        (sum($"gap_us").cast("double") / count(lit(1))).as("avg_gap_us"))
  }

  /** Literal quantity bands for the range join: [lo, hi) per bucket. */
  val quantityBands: Seq[(String, Int, Int)] =
    Seq(("tiny", 0, 10), ("small", 10, 25), ("mid", 25, 40), ("big", 40, 100))

  /** Non-equi range join of lineitem against a broadcast literal band
    * table (reference C5-style bucket classification expressed as a JOIN,
    * the plan shape interval/range lookups take at scale: fact side never
    * shuffles, band table broadcasts).
    */
  def quantityBandJoin(li: DataFrame): DataFrame = {
    import li.sparkSession.implicits._
    val bands = li.sparkSession.createDataFrame(quantityBands)
      .toDF("band", "lo", "hi")
    li.join(broadcast(bands),
        $"l_quantity" >= $"lo" && $"l_quantity" < $"hi")
      .groupBy($"band")
      .agg(count(lit(1)).as("n_lines"),
        (sum(cents($"l_extendedprice")).cast("double") / 100.0).as("revenue"))
  }

  /** Exact lower-median order price per priority: the row at rank
    * ⌈n/2⌉ in (price, orderkey) order — rank ties are impossible under the
    * compound key, so the result is total and partitioning-independent.
    */
  def medianPricePerPriority(orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"cents".asc, $"o_orderkey".asc)
    val wAll = Window.partitionBy($"o_orderpriority")
    orders
      .select($"o_orderpriority", cents($"o_totalprice").as("cents"), $"o_orderkey")
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wAll))
      // Column `/` is double division — truncate to get ⌈n/2⌉ = (n+1)÷2.
      .filter($"rn" === (($"cnt" + 1) / 2).cast("long"))
      .select($"o_orderpriority", ($"cents".cast("double") / 100.0).as("median_price"),
        $"cnt".as("n_orders"))
  }

  /** Sketch accuracy for the approx rank statistics: rank error ≤ n/1e4 —
    * at any realistic group size the returned element sits within 0.01 %
    * of the true rank, while the sketch stays a few KB per group.
    */
  val approxAccuracy = 10000

  /** Row-count threshold for the *Adaptive dispatchers: below it the
    * exact window-rank form is cheap (every group sorts in one task but
    * groups are small); above it the single-task-per-group sort becomes
    * the straggler and the sketch aggregate takes over.
    */
  val exactRankMaxRows = 10L * 1000 * 1000

  /** [[medianPricePerPriority]] in sketch form: approx_percentile is ONE
    * hash aggregate — partial sketches merge map-side, no per-key window
    * sort, so parallelism is input-partition-bound instead of capped at
    * the 5 distinct priorities. Same output schema as the exact form;
    * the returned median is an actual data element within rank error
    * n/[[approxAccuracy]] of the true lower median.
    */
  def medianPriceApprox(orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    orders
      .select($"o_orderpriority", cents($"o_totalprice").as("cents"))
      .groupBy($"o_orderpriority")
      .agg(approx_percentile($"cents", lit(0.5), lit(approxAccuracy)).as("mc"),
        count(lit(1)).as("n_orders"))
      .select($"o_orderpriority", ($"mc".cast("double") / 100.0).as("median_price"),
        $"n_orders")
  }

  /** Size-dispatched median: exact rank while the relation is small
    * enough that per-key sorts cannot straggle, sketch aggregate past
    * [[exactRankMaxRows]]. The count is a cheap columnar action.
    */
  def medianPriceAdaptive(orders: DataFrame,
      exactBelow: Long = exactRankMaxRows): DataFrame =
    if (orders.count() <= exactBelow) medianPricePerPriority(orders)
    else medianPriceApprox(orders)

  /** Per-source corpus card — the ingest summary a training-data pipeline
    * reports: document/char volume, language mix, quality accept rate,
    * exact-duplicate incidence. Composes the quality and fingerprint
    * operators; per-doc joins shuffle on doc_id once each, the final
    * rollup is a low-cardinality hash aggregate.
    */
  def corpusReport(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val quality = TextAnalysis.qualityScore(docs).select($"doc_id", $"accept")
    val dup = TextAnalysis.fingerprints(docs)
      .withColumn("copies", count(lit(1)).over(Window.partitionBy($"fp")))
      .select($"doc_id", ($"copies" > 1).as("dup"))
    docs.select($"doc_id", $"source", $"lang", $"n_chars")
      .join(quality, "doc_id")
      .join(dup, "doc_id")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("chars"),
        countDistinct($"lang").as("n_langs"),
        sum(when($"accept", 1L).otherwise(0L)).as("n_accept"),
        sum(when($"dup", 1L).otherwise(0L)).as("n_dups"))
  }

  /** Per-source p95 length cutoff by exact rank (rank ⌈0.95·n⌉ in the
    * (n_chars, doc_id) total order — integer-deterministic, no
    * interpolation ambiguity across engines) and the outlier flag per
    * document. The standard length-outlier trim of a pre-training
    * pipeline; one window partitioned by source + one broadcastable join
    * of the per-source cutoffs.
    */
  def lengthOutliers(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"source").orderBy($"n_chars".asc, $"doc_id".asc)
    val cutoffs = docs.select($"source", $"n_chars", $"doc_id")
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy($"source")))
      .filter($"rn" === ceil($"cnt" * 0.95).cast("int"))
      .select($"source", $"n_chars".as("p95"))
    docs.select($"doc_id", $"source", $"n_chars")
      .join(broadcast(cutoffs), "source")
      .withColumn("outlier", $"n_chars" > $"p95")
  }

  /** [[lengthOutliers]] in sketch form: the per-source p95 cutoff from
    * approx_percentile (one hash aggregate, map-side sketch merge — no
    * per-source window sort, so a 100 TB corpus with 20 sources doesn't
    * reduce to 20 straggler tasks), then the same broadcast cutoff join.
    */
  def lengthOutliersApprox(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val cutoffs = docs.groupBy($"source")
      .agg(approx_percentile($"n_chars", lit(0.95), lit(approxAccuracy)).as("p95"))
    docs.select($"doc_id", $"source", $"n_chars")
      .join(broadcast(cutoffs), "source")
      .withColumn("outlier", $"n_chars" > $"p95")
  }

  /** Size-dispatched length-outlier trim — see [[medianPriceAdaptive]]. */
  def lengthOutliersAdaptive(docs: DataFrame,
      exactBelow: Long = exactRankMaxRows): DataFrame =
    if (docs.count() <= exactBelow) lengthOutliers(docs)
    else lengthOutliersApprox(docs)

  /** Cross-source shingle-overlap matrix — the provenance view of
    * inter-source contamination: for each source pair, the count of
    * distinct 3-gram shingles with document frequency ≤ maxDf present in
    * both. Stop-shingles (df > maxDf) carry no provenance signal — they
    * co-occur everywhere — and are cut before pairing, the same
    * df-threshold idea as the Jaccard prefix filter.
    *
    * Shape: ONE shuffle — groupBy(s64) folds each shingle to
    * (df, source-set). Both aggregates combine map-side (the set is
    * bounded by the source count), so a df=10⁹ stop-shingle cannot skew
    * a reducer. Source pairs then expand map-side from the per-shingle
    * set — ≤ |sources|² rows per shingle, no shingle-keyed self-join
    * anywhere (the previous formulation self-joined the (source,
    * shingle) projection: a second full shuffle plus Σ df² join work).
    */
  /** Default stop-shingle cut for [[sourceOverlap]]: high enough that no
    * shingle reaches it at test scale (max df 25 at sf0.1), an actual
    * cut on a real corpus where function-word shingles hit df ≈ corpus
    * size.
    */
  val defaultStopShingleDf = 100L

  def sourceOverlap(docs: DataFrame, maxDf: Long = defaultStopShingleDf): DataFrame = {
    import docs.sparkSession.implicits._
    Dedup.shingleIndex(docs)
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .groupBy($"s64")
      .agg(count(lit(1)).as("df"), collect_set($"source").as("srcs"))
      .filter($"df" <= maxDf)
      .select(explode($"srcs").as("source_a"), $"srcs")
      .select($"source_a", explode($"srcs").as("source_b"))
      .filter($"source_a" < $"source_b")
      .groupBy($"source_a", $"source_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q68_corpus_report" -> ((s, d) => corpusReport(Tables.load(s, d).documents)),
    "q69_length_outliers" -> ((s, d) => lengthOutliers(Tables.load(s, d).documents)),
    "q70_source_overlap" -> ((s, d) => sourceOverlap(Tables.load(s, d).documents)),
    "q53_revenue_rollup" -> ((s, d) => {
      val t = Tables.load(s, d)
      revenueRollup(t.region, t.nation, t.customer, t.orders)
    }),
    "q54_hourly_pivot" -> ((s, d) => hourlyTypePivot(Tables.load(s, d).events)),
    "q55_user_event_gaps" -> ((s, d) => userEventGaps(Tables.load(s, d).events)),
    "q56_quantity_bands" -> ((s, d) => quantityBandJoin(Tables.load(s, d).lineitem)),
    "q57_median_price" -> ((s, d) =>
      medianPricePerPriority(Tables.load(s, d).orders)),
    // Sketch forms of q57/q69. At the driver's oracle scale every group
    // holds n < approxAccuracy rows, so the sketch's rank-error budget
    // n/approxAccuracy is < 1: compression can never drop a sample that
    // moves any rank, and the query is forced to return the element at
    // exactly rank ceil(p*n) — the same element the exact forms select.
    // The exact SQL is therefore a true oracle AT THE sf0.01 GATE ONLY:
    // at sf0.1 orders groups hold ~30k rows, the budget is ~3 ranks,
    // and the sketch legitimately returns a value a few ranks off the
    // exact median (measured ~0.01% of its magnitude) — the bounded
    // error ReportingSpec asserts at sf0.1, not a mismatch bug.
    "q71_median_price_approx" -> ((s, d) =>
      medianPriceApprox(Tables.load(s, d).orders)),
    "q72_length_outliers_approx" -> ((s, d) =>
      lengthOutliersApprox(Tables.load(s, d).documents)),
    // Adaptive dispatchers on the driver-checked surface: at oracle scale
    // both sit below exactRankMaxRows, so the exact plan runs and the
    // exact SQL is the oracle; the sketch side of the dispatch is
    // spec-covered (ReportingSpec plan-shape tests with exactBelow = 0).
    "q73_median_price_adaptive" -> ((s, d) =>
      medianPriceAdaptive(Tables.load(s, d).orders)),
    "q74_length_outliers_adaptive" -> ((s, d) =>
      lengthOutliersAdaptive(Tables.load(s, d).documents))
  )

  /** Exact p95-cutoff SQL — oracle for q69 and, in the exact regime
    * (n < [[approxAccuracy]] per source, see the q71/q72 registration
    * note), for the sketch and adaptive forms q72/q74 too.
    */
  private val lengthOutliersSql: String =
    """WITH cut AS (
      |  SELECT source, n_chars AS p95 FROM (
      |    SELECT source, n_chars, doc_id,
      |      ROW_NUMBER() OVER (PARTITION BY source
      |        ORDER BY n_chars ASC, doc_id ASC) AS rn,
      |      COUNT(*) OVER (PARTITION BY source) AS cnt
      |    FROM documents)
      |  WHERE rn = CAST(CEIL(cnt * 0.95) AS INT))
      |SELECT d.doc_id, d.source, d.n_chars, cut.p95,
      |  d.n_chars > cut.p95 AS outlier
      |FROM documents d JOIN cut USING (source)""".stripMargin

  /** Exact lower-median SQL — oracle for q57 and, in the exact regime,
    * for q71/q73.
    */
  private val medianPriceSql: String =
    s"""SELECT o_orderpriority,
       |  c / 100.0 AS median_price, cnt AS n_orders
       |FROM (
       |  SELECT o_orderpriority, ${centsSql("o_totalprice")} AS c,
       |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
       |      ORDER BY ${centsSql("o_totalprice")} ASC, o_orderkey ASC) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS cnt
       |  FROM orders)
       |WHERE rn = (cnt + 1) // 2""".stripMargin

  def oracles: Map[String, String] = Map(
    "q69_length_outliers" -> lengthOutliersSql,
    "q71_median_price_approx" -> medianPriceSql,
    "q72_length_outliers_approx" -> lengthOutliersSql,
    "q73_median_price_adaptive" -> medianPriceSql,
    "q74_length_outliers_adaptive" -> lengthOutliersSql,
    "q70_source_overlap" ->
      s"""${Dedup.shingleCte},
         |keep AS (
         |  SELECT ${hash60Sql("s")} AS s64
         |  FROM sh GROUP BY 1 HAVING COUNT(*) <= $defaultStopShingleDf),
         |src_sh AS (
         |  SELECT DISTINCT d.source, ${hash60Sql("sh.s")} AS s64
         |  FROM sh JOIN documents d USING (doc_id)
         |  WHERE ${hash60Sql("sh.s")} IN (SELECT s64 FROM keep))
         |SELECT x.source AS source_a, y.source AS source_b,
         |  COUNT(*) AS n_shared
         |FROM src_sh x JOIN src_sh y
         |  ON x.s64 = y.s64 AND x.source < y.source
         |GROUP BY x.source, y.source""".stripMargin,
    "q68_corpus_report" ->
      s"""WITH q AS (${TextAnalysis.oracles("q22_quality_score")}),
         |dup AS (
         |  SELECT doc_id,
         |    COUNT(*) OVER (PARTITION BY ${TextAnalysis.fingerprintSql}) > 1 AS dup
         |  FROM documents)
         |SELECT source,
         |  COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS chars,
         |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |  CAST(SUM(CASE WHEN q.accept THEN 1 ELSE 0 END) AS BIGINT) AS n_accept,
         |  CAST(SUM(CASE WHEN dup.dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups
         |FROM documents d
         |JOIN q USING (doc_id)
         |JOIN dup USING (doc_id)
         |GROUP BY source""".stripMargin,
    "q53_revenue_rollup" ->
      s"""SELECT COALESCE(r_name, '<all>') AS region_name,
         |  COALESCE(n_name, '<all>') AS nation_name,
         |  n_orders, revenue
         |FROM (
         |  SELECT r_name, n_name, COUNT(*) AS n_orders,
         |    CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) / 100.0 AS revenue
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  GROUP BY ROLLUP (r_name, n_name))""".stripMargin,
    "q54_hourly_pivot" -> {
      val cols = eventTypes.map(t =>
        s"CAST(COUNT(*) FILTER (event_type = '$t') AS BIGINT) AS $t").mkString(",\n  ")
      s"""SELECT CAST((epoch_ns(ts) // 1000) // 3600000000 % 24 AS BIGINT) AS hod,
         |  $cols
         |FROM events GROUP BY 1""".stripMargin
    },
    "q55_user_event_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_ns(ts) // 1000
        |      - LAG(epoch_ns(ts) // 1000, 1) OVER (PARTITION BY user_id
        |          ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC) AS gap_us
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_gaps,
        |  CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
        |  CAST(SUM(gap_us) AS BIGINT) / CAST(COUNT(*) AS DOUBLE) AS avg_gap_us
        |FROM g WHERE gap_us IS NOT NULL GROUP BY user_id""".stripMargin,
    "q56_quantity_bands" -> {
      val values = quantityBands.map { case (b, lo, hi) =>
        s"('$b', $lo, $hi)"
      }.mkString(", ")
      s"""SELECT band, COUNT(*) AS n_lines,
         |  CAST(SUM(${centsSql("l_extendedprice")}) AS BIGINT) / 100.0 AS revenue
         |FROM lineitem
         |JOIN (VALUES $values) bands(band, lo, hi)
         |  ON l_quantity >= lo AND l_quantity < hi
         |GROUP BY band""".stripMargin
    },
    "q57_median_price" -> medianPriceSql
  )
}
