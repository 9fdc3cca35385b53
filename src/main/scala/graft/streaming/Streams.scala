package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.functions.Fp._

/** Structured Streaming face of the engine (SURVEY.md §2.12). The
  * reference's "streaming" is incremental batch — resume from checkpointed
  * state, process only new items, persist state every N items
  * (/root/reference/data_pipeline/scrapers/any_scraper.py:103-116,
  * zalando_gallery_scraper_s3.py:107-115). Structured Streaming gives the
  * same semantics natively: file-arrival sources, checkpointLocation,
  * exactly-once sinks via foreachBatch, and state stores for dedup and
  * quota counters.
  *
  * All transforms are shared with the batch operators — the DataFrame
  * formulations in graft.operators run unchanged under readStream where
  * Spark supports them; this module adds the stream-only pieces
  * (watermarks, stateful quotas, dedup-with-state).
  */
object Streams {

  /** Streaming source over a directory of events parquet files
    * (file-arrival semantics; the source must be a directory). The events
    * table's TIMESTAMP(NANOS) quirk is handled the same way as in
    * Tables.load.
    */
  def eventsStream(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // readStream needs an explicit schema; take it from the files already
    // present (one footer read at plan time) so the generator's ts
    // representation — raw nanos, NTZ, or UTC — is whatever arrives, then
    // normalize exactly like the batch loader. An EMPTY directory (stream
    // created before the first file arrives — the file-arrival use case)
    // can't be sniffed, so it falls back to the generator's current
    // shape — Tables.eventsFallbackSchema, the shared constant, so a
    // generator drift is a single-point change instead of a silent
    // misread here. The schema is fixed at stream start either way, so
    // all files one stream directory ever receives must share one ts
    // encoding — a later file of a different vintage would be misread.
    val schema = scala.util.Try(spark.read.parquet(eventsDir).schema)
      .getOrElse(graft.Tables.eventsFallbackSchema)
    graft.Tables.normalizeTs(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(eventsDir))
  }

  /** Watermarked tumbling-window rollup — the streaming form of
    * Sessions.hourlyRollup. Late data beyond 2 hours is dropped at the
    * state store instead of growing it unboundedly.
    */
  def hourlyRollupStream(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(cents($"value")).cast("double") / 100.0).as("sum_value"))
      .select(unix_micros($"window.start").as("bucket_us"), $"event_type",
        $"n", $"sum_value")
  }

  /** Streaming gap sessionization via the native session_window aggregate
    * (the streaming face of Sessions.sessionize): sessions close when no
    * event arrives within the gap; the watermark lets the state store
    * finalize and emit closed sessions.
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window($"ts", s"$gapMinutes minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros($"ts")).as("start_us"),
        max(unix_micros($"ts")).as("end_us"))
      .select($"user_id", $"n_events", $"start_us", $"end_us")
  }

  /** Streaming exact dedup on a key with state-store backing (reference
    * D2/D3 cross-run dedup): watermark bounds how long a key is
    * remembered.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "24 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Per-user quota as explicit keyed state (reference R4 quota counters,
    * D6 consecutive-empty-page stop): emit only the first `quota` events
    * per user across all micro-batches.
    */
  def quotaStream(events: DataFrame, quota: Int): DataFrame = {
    import events.sparkSession.implicits._
    val typed = events.select($"user_id".as[Long], $"event_id".as[Long])
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val seen = state.getOption.getOrElse(0L)
          val take = rows.take(math.max(0, quota - seen.toInt)).toSeq
          state.update(seen + take.size)
          take.iterator
      }.toDF("user_id", "event_id")
  }

  /** Micro-batch sink with checkpointed exactly-once-ish delivery
    * (reference K3/K5): batch N+1 computes while batch N's sink commits;
    * the batchId gives idempotent replay on recovery.
    */
  def toForeachBatchSink(df: DataFrame, checkpointDir: String)(
      handle: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) => handle(batch, id) }
      .start()
}
