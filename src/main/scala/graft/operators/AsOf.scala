package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of join — an operator Spark lacks natively (SURVEY.md §2.7 notes the
  * engine inherits standard joins from Spark; this adds the time-series
  * one). Composed from built-ins per the preference ladder (compose before
  * custom-plan): union the two sides tagged, sort per key by (time, tag),
  * and carry the right side's payload forward with a last(ignoreNulls)
  * running window — each left row then holds the most recent right row
  * with ts_r <= ts_l.
  *
  * Scale: one shuffle on the key + one in-partition sort — identical cost
  * shape to a sort-merge join, no per-row lookups, no broadcast
  * requirement on either side. Right rows are pre-deduped to one per
  * (key, timestamp) so the "latest at equal time" row is total-order
  * defined in both this implementation and the DuckDB ASOF oracle.
  */
object AsOf {

  /** For each purchase event, attach the user's most recent prior-or-equal
    * 'view' event value.
    */
  def purchasesWithLastView(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val base = events.select($"user_id", $"event_id", $"event_type",
      unix_micros($"ts").as("us"), $"value")
    val left = base.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"us", lit(1).as("tag"),
        lit(null).cast("double").as("r_value"))
    // One right row per (user, us): keep the max event_id's value so the
    // equal-time winner is well-defined on both engines.
    val wDedup = Window.partitionBy($"user_id", $"us")
      .orderBy($"event_id".desc)
    val right = base.filter($"event_type" === "view")
      .withColumn("rn", row_number().over(wDedup)).filter($"rn" === 1)
      .select($"user_id", lit(null).cast("long").as("event_id"), $"us",
        lit(0).as("tag"), $"value".as("r_value"))
    val wCarry = Window.partitionBy($"user_id")
      .orderBy($"us".asc, $"tag".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("last_view_value",
        last($"r_value", ignoreNulls = true).over(wCarry))
      .filter($"tag" === 1)
      .select($"user_id", $"event_id", $"us", $"last_view_value")
  }

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q52_asof_join" -> ((s, d) => purchasesWithLastView(Tables.load(s, d).events))
  )

  def oracles: Map[String, String] = Map(
    // DuckDB's native ASOF JOIN is the independent implementation.
    "q52_asof_join" ->
      """WITH base AS (
        |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us, value
        |  FROM events),
        |purchases AS (
        |  SELECT user_id, event_id, us FROM base WHERE event_type = 'purchase'),
        |views AS (
        |  SELECT user_id, us, value FROM (
        |    SELECT user_id, us, value,
        |      ROW_NUMBER() OVER (PARTITION BY user_id, us ORDER BY event_id DESC) AS rn
        |    FROM base WHERE event_type = 'view') WHERE rn = 1)
        |SELECT p.user_id, p.event_id, p.us, v.value AS last_view_value
        |FROM purchases p
        |ASOF LEFT JOIN views v
        |  ON p.user_id = v.user_id AND v.us <= p.us""".stripMargin
  )
}
