package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish testdata (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. At 100 TB these would be
  * partitioned/bucketed table roots instead of single files; all operators
  * in this library take a [[DataFrame]], so the storage layout is the
  * caller's concern — scans stay pushdown-friendly either way.
  */
final case class Tables(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    events: DataFrame,
    documents: DataFrame,
    embeddings: DataFrame
)

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Memoized per (session, dir): spark.read.parquet runs a schema-inference
  // job per call, so re-loading for every query in a batch run costs 10
  // footer reads each time. The cached value holds only lazy plans — no
  // data is pinned. This is the engine's (minimal) catalog.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Tables]

  def load(spark: SparkSession, sfDir: String): Tables =
    cache.getOrElseUpdate((spark, sfDir), doLoad(spark, sfDir))

  /** Drop a session's cached loaders. Call after stopping a session in a
    * long-lived multi-session process — the memo map otherwise keeps the
    * stopped session (and its plans) strongly reachable forever.
    */
  def invalidate(spark: SparkSession): Unit =
    cache.keys.filter(_._1 eq spark).foreach(cache.remove)

  /** The driver generator's CURRENT events schema (TIMESTAMP_NTZ
    * vintage) — the single source of truth for consumers that cannot
    * sniff a parquet footer, i.e. Streams.eventsStream's empty-directory
    * fallback. The batch path reads schema-on-footer and normalizes any
    * vintage via [[normalizeTs]]; only footerless consumers pin this
    * shape. If the generator drifts (new column, different ts type),
    * update it HERE and every fallback follows.
    */
  val eventsFallbackSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP_NTZ, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")

  /** Normalize events.ts to TimestampType (UTC micros) across the schema
    * variants the driver's generator has emitted: parquet TIMESTAMP(NANOS)
    * (read as raw nanos via nanosAsLong — integer div, a double division
    * would lose precision above 2^53 ns), TIMESTAMP_NTZ (cast reads the
    * wall time in the session zone, pinned UTC), or already TIMESTAMP.
    * DuckDB's `epoch_ns(ts) // 1000` truncates identically for all three,
    * so the oracles are representation-independent.
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  private def doLoad(spark: SparkSession, sfDir: String): Tables = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def t(n: String): DataFrame = spark.read.parquet(s"$sfDir/$n.parquet")
    val events = normalizeTs(t("events"))
    Tables(
      region = t("region"), nation = t("nation"), customer = t("customer"),
      supplier = t("supplier"), part = t("part"), orders = t("orders"),
      lineitem = t("lineitem"), events = events,
      documents = t("documents"), embeddings = t("embeddings"))
  }
}
