package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fp._

/** Event-time operators: gap sessionization, tumbling-window rollups,
  * per-key quotas, and incremental anti-join resume — the batch face of the
  * reference's incremental processing (SURVEY.md §2.12: checkpointed
  * resume at /root/reference/data_pipeline/scrapers/any_scraper.py:103-116,
  * quota enforcement R4 at zalando_production_scraper.py:176-223).
  *
  * The same transforms run under Structured Streaming (see
  * graft.streaming): sessionization maps to flatMapGroupsWithState /
  * session_window, the rollup to a watermarked windowed agg, and the
  * anti-join resume to a state-store dedup. Batch formulations here are
  * what the DuckDB oracle can check.
  *
  * Time determinism: events.ts is nanos in parquet; both engines are
  * compared at microsecond precision via integer division (no float
  * epoch math — see Tables.load).
  */
object Sessions {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Two windows over
    * the same (user, time, id) ordering — one shuffle on user_id.
    */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy($"user_id").orderBy($"us".asc, $"event_id".asc)
    val prev = lag($"us", 1).over(w)
    val newSession = when(prev.isNull || $"us" - prev > gapUs, 1L).otherwise(0L)
    events
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      .withColumn("session_id",
        sum(newSession).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"), min($"us").as("start_us"),
        max($"us").as("end_us"))
      .withColumn("duration_s",
        ($"end_us" - $"start_us").cast("double") / 1000000.0)
  }

  /** Tumbling-window rollup (streaming equivalent: window($"ts","1 hour")
    * + watermark). Bucket key is epoch micros of the truncated hour so the
    * oracle compare is integer-exact.
    */
  def hourlyRollup(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(unix_micros(date_trunc("hour", $"ts")).as("bucket_us"),
        $"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(cents($"value")).cast("double") / 100.0).as("sum_value"))
  }

  /** Per-key quota: first k events per user in event-time order (reference
    * R4 max_items_per_run). Streaming equivalent: counter in
    * mapGroupsWithState.
    */
  def firstKPerUser(events: DataFrame, k: Int): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"event_id".asc)
    events.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
      .select($"user_id", $"event_id", $"rk", unix_micros($"ts").as("us"))
  }

  /** Incremental resume via left-anti join against processed state
    * (reference D2-D4): new-period events whose (user, type) was never seen
    * before the cutoff. At scale the state side is a compact keyed table —
    * broadcast if small, else a shuffled anti-join on the state key.
    */
  def unseenAfterCutoff(events: DataFrame, cutoff: String): DataFrame = {
    import events.sparkSession.implicits._
    val cut = lit(cutoff).cast("timestamp")
    val state = events.filter($"ts" < cut)
      .select($"user_id", $"event_type").distinct()
    events.filter($"ts" >= cut)
      .join(state, Seq("user_id", "event_type"), "left_anti")
      .select($"user_id", $"event_type", $"event_id")
  }

  /** Gap-fill + consecutive-empty-run detection (batch analog of the
    * reference's stop-after-3-empty-pages D6,
    * /root/reference/data_pipeline/scrapers/any_scraper.py:686-698):
    * per event_type, build the dense hour spine between its first and last
    * event, left-join actual counts, and report maximal runs of ≥ minRun
    * consecutive empty hours (classic gaps-and-islands via the
    * h − row_number grouping trick).
    */
  def emptyHourRuns(events: DataFrame, minRun: Int): DataFrame = {
    import events.sparkSession.implicits._
    val hours = events.select($"event_type",
      expr("unix_micros(ts) div 3600000000").as("h"))
    val counts = hours.groupBy($"event_type", $"h").agg(count(lit(1)).as("n"))
    val spine = hours.groupBy($"event_type")
      .agg(min($"h").as("h0"), max($"h").as("h1"))
      .select($"event_type", explode(sequence($"h0", $"h1")).as("h"))
    val empties = spine.join(counts, Seq("event_type", "h"), "left_anti")
    val grp = $"h" - row_number().over(
      Window.partitionBy($"event_type").orderBy($"h".asc))
    empties
      .withColumn("grp", grp)
      .groupBy($"event_type", $"grp")
      .agg(min($"h").as("run_start_h"), count(lit(1)).as("run_len"))
      .filter($"run_len" >= minRun)
      .select($"event_type", $"run_start_h", $"run_len")
  }

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q50_empty_hour_runs" -> ((s, d) =>
      emptyHourRuns(Tables.load(s, d).events, 2)),
    "q29_sessionize" -> ((s, d) => sessionize(Tables.load(s, d).events, 30)),
    "q30_hourly_rollup" -> ((s, d) => hourlyRollup(Tables.load(s, d).events)),
    "q31_first_k_per_user" -> ((s, d) => firstKPerUser(Tables.load(s, d).events, 3)),
    "q32_incremental_unseen" -> ((s, d) =>
      unseenAfterCutoff(Tables.load(s, d).events, "2024-01-04"))
  )

  def oracles: Map[String, String] = Map(
    "q50_empty_hour_runs" ->
      """WITH hrs AS (
        |  SELECT event_type, CAST((epoch_ns(ts) // 1000) // 3600000000 AS BIGINT) AS h
        |  FROM events),
        |counts AS (SELECT event_type, h, COUNT(*) AS n FROM hrs GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(min(h), max(h))) AS h
        |  FROM hrs GROUP BY event_type),
        |empties AS (
        |  SELECT s.event_type, s.h FROM spine s
        |  WHERE NOT EXISTS (SELECT 1 FROM counts c
        |    WHERE c.event_type = s.event_type AND c.h = s.h)),
        |runs AS (
        |  SELECT event_type, h,
        |    h - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h ASC) AS grp
        |  FROM empties)
        |SELECT event_type, MIN(h) AS run_start_h, COUNT(*) AS run_len
        |FROM runs GROUP BY event_type, grp
        |HAVING COUNT(*) >= 2""".stripMargin,
    "q29_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events),
        |f AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)),
        |g AS (
        |  SELECT user_id, us,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(us) AS start_us, MAX(us) AS end_us,
        |  CAST(MAX(us) - MIN(us) AS DOUBLE) / 1000000.0 AS duration_s
        |FROM g GROUP BY user_id, session_id""".stripMargin,
    "q30_hourly_rollup" ->
      s"""SELECT epoch_ns(date_trunc('hour', ts)) // 1000 AS bucket_us, event_type,
         |  COUNT(*) AS n,
         |  CAST(SUM(${centsSql("value")}) AS BIGINT) / 100.0 AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q31_first_k_per_user" ->
      """SELECT user_id, event_id, rk, us FROM (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC) AS BIGINT) AS rk
        |  FROM events) WHERE rk <= 3""".stripMargin,
    "q32_incremental_unseen" ->
      """SELECT user_id, event_type, event_id FROM events e
        |WHERE ts >= TIMESTAMP '2024-01-04'
        |  AND NOT EXISTS (SELECT 1 FROM events s
        |    WHERE s.ts < TIMESTAMP '2024-01-04'
        |      AND s.user_id = e.user_id AND s.event_type = e.event_type)""".stripMargin
  )
}
