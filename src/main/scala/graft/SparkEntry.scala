package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] binds one operator from the SURVEY.md §2
  * inventory to the driver's testdata; [[oracleSql]] holds the DuckDB
  * equivalent the driver hash-compares against. Column names and types are
  * aligned on both sides (the compare sorts columns by name before
  * hashing), and all float-producing aggregations are written to be
  * bit-deterministic across engines (see graft.functions.Fp).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_top_revenue_orders")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextAnalysis.queries ++ Dedup.queries ++
      Sessions.queries ++ Rules.queries ++ Sampling.queries ++
      Similarity.queries ++ UrlOps.queries ++ VectorStats.queries ++
      Catalog.queries ++ Pairing.queries ++ AsOf.queries ++
      Reporting.queries ++ Skew.queries ++ IngestGate.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextAnalysis.oracles ++ Dedup.oracles ++
      Sessions.oracles ++ Rules.oracles ++ Sampling.oracles ++
      Similarity.oracles ++ UrlOps.oracles ++ VectorStats.oracles ++
      Catalog.oracles ++ Pairing.oracles ++ AsOf.oracles ++
      Reporting.oracles ++ Skew.oracles ++ IngestGate.oracles
}
