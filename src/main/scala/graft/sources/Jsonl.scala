package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Error-tolerant JSONL ingestion (reference S1,
  * /root/reference/AsyncImageGen/src/parser.py:5-45 and
  * /root/reference/prompts_parser.py:35-86): stream records, keep corrupt
  * lines in a side channel, require a key field.
  *
  * PERMISSIVE mode + _corrupt_record is the Spark-native equivalent of the
  * reference's per-line try/except-and-skip: malformed rows land in the
  * corrupt column instead of killing the scan, and the valid/invalid split
  * is two pushdown-friendly filters over one pass.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read JSONL with an explicit schema; corrupt lines retained. The
    * returned frame has the schema's fields plus [[CorruptCol]].
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, "string")
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Valid records: parsed, corrupt-free, and carrying the required key
    * (the reference skips records without prompt_number).
    */
  def valid(df: DataFrame, requiredField: String): DataFrame =
    df.filter(col(CorruptCol).isNull && col(requiredField).isNotNull)
      .drop(CorruptCol)

  /** Rejected lines, for a quarantine sink (reference logs-and-skips).
    * Corrupt lines carry the original text; rows that parsed but lack the
    * required key have a NULL corrupt column, so their content is
    * round-tripped through to_json — recoverable either way, never NULL.
    */
  def rejects(df: DataFrame, requiredField: String): DataFrame = {
    val parsedFields = df.columns.filterNot(_ == CorruptCol).map(col)
    df.filter(col(CorruptCol).isNotNull || col(requiredField).isNull)
      .select(coalesce(col(CorruptCol),
        to_json(struct(parsedFields: _*),
          java.util.Collections.singletonMap("ignoreNullFields", "false")))
        .as("raw"))
  }

  /** Streaming variant of [[read]] — same tolerance, file-arrival source
    * (reference's incremental prompt stream).
    */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withCorrupt = schema.add(CorruptCol, "string")
    spark.readStream
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }
}
