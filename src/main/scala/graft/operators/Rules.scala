package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Conditional data-correction rules and defaults back-fill (reference
  * §2.10: nested-defaults table at
  * /root/reference/data_pipeline/prompts/mllm_to_vlm_converter.py:9-63,
  * plausibility corrections at :65-85, error classification at
  * test_website_accessibility.py:296-323). Pure CASE WHEN / coalesce
  * chains — fully codegen'd, no shuffle.
  */
object Rules {

  /** Defaults fill + plausibility corrections over the event stream:
    *  - JSON field k extracted with a -1 default (C1 defaults table);
    *  - absent JSON field m back-filled with 0 (C1);
    *  - event_type corrected by value-plausibility rules (C2);
    *  - severity classified from type+value indicators (C4/T10).
    */
  def enrichEvents(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events.select(
        $"event_id", $"event_type", $"value",
        coalesce(get_json_object($"props", "$.k").cast("long"), lit(-1L)).as("k"),
        coalesce(get_json_object($"props", "$.m").cast("long"), lit(0L)).as("m"))
      .withColumn("corrected_type",
        when($"event_type" === "error" && $"value" > 150.0, "critical_error")
          .when($"event_type" === "purchase" && $"value" < 10.0, "micro_purchase")
          .otherwise($"event_type"))
      .withColumn("severity",
        when($"corrected_type" === "critical_error", "p0")
          .when($"corrected_type" === "error", "p1")
          .when($"k" >= 90, "watch")
          .otherwise("ok"))
      .select($"event_id", $"k", $"m", $"corrected_type", $"severity")
  }

  /** Strict VL-analysis schema (reference qwen_vl_processor.py:130-168's
    * prompt contract).
    */
  val vlSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "garment_type STRING, edit_instructions ARRAY<STRING>, " +
        "edit_strength STRING, confidence_score DOUBLE, feasibility STRING")

  /** T13: structure sloppy model output (reference _parse_vl_response,
    * qwen_vl_processor.py:175-187): take the first '{' through the last
    * '}' — which strips markdown fences and prose prefixes/suffixes —
    * parse against [[vlSchema]], and fall back to carrying the whole
    * response in raw_response when no valid JSON object survives
    * (truncated braces, unquoted values, no JSON at all).
    *
    * All codegen expressions (instr/reverse/substring/from_json), no UDF,
    * no shuffle — per-row map work at any scale.
    */
  def parseVlResponses(responses: DataFrame, respCol: String = "response"): DataFrame = {
    import responses.sparkSession.implicits._
    val s = col(respCol)
    val start = instr(s, "{")
    val end = length(s) - instr(reverse(s), "}") + lit(1)
    val jsonStr = when(start > 0 && end >= start,
      substring(s, start, (end - start + 1).cast("int")))
    // PERMISSIVE + corrupt-record column: malformed JSON inside the brace
    // window lands in _corrupt instead of failing the task, mirroring the
    // reference's except-JSONDecodeError fallback.
    val parseSchema = vlSchema.add("_corrupt",
      org.apache.spark.sql.types.StringType)
    responses
      .withColumn("_p", from_json(jsonStr, parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")))
      .withColumn("parsed", $"_p".isNotNull && $"_p._corrupt".isNull)
      .select(responses.columns.filter(_ != respCol).map(col) ++ Seq(
        col("_p.garment_type").as("garment_type"),
        col("_p.edit_instructions").as("edit_instructions"),
        col("_p.edit_strength").as("edit_strength"),
        col("_p.confidence_score").as("confidence_score"),
        col("_p.feasibility").as("feasibility"),
        $"parsed",
        when(!$"parsed", s).otherwise(lit("")).as("raw_response")): _*)
  }

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q33_enrich_events" -> ((s, d) => enrichEvents(Tables.load(s, d).events))
  )

  def oracles: Map[String, String] = Map(
    "q33_enrich_events" ->
      """SELECT event_id, k, m, corrected_type,
        |  CASE WHEN corrected_type = 'critical_error' THEN 'p0'
        |       WHEN corrected_type = 'error' THEN 'p1'
        |       WHEN k >= 90 THEN 'watch'
        |       ELSE 'ok' END AS severity
        |FROM (
        |  SELECT event_id, k, m,
        |    CASE WHEN event_type = 'error' AND value > CAST(150 AS DOUBLE) THEN 'critical_error'
        |         WHEN event_type = 'purchase' AND value < CAST(10 AS DOUBLE) THEN 'micro_purchase'
        |         ELSE event_type END AS corrected_type
        |  FROM (
        |    SELECT event_id, event_type, value,
        |      COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k,
        |      COALESCE(TRY_CAST(json_extract_string(props, '$.m') AS BIGINT), 0) AS m
        |    FROM events))""".stripMargin
  )
}
