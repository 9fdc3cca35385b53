package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-index / file-catalog operator (reference S4/S5 directory and
  * prefix listing + A6 index counts,
  * /root/reference/data_pipeline/utils/image_utils.py:50-73,
  * /root/reference/AsyncImageGen/src/s3_uploader.py:40-79): scan a storage
  * prefix, extract the logical asset name from each path. binaryFile
  * prunes the content column, so this is a metadata-only listing scan.
  *
  * The correctness binding pins the t2 correctness prefix
  * (/root/testdata/sf0.01) on BOTH the Spark and oracle sides — the
  * operator under test is the listing+extraction, which must not depend on
  * which sfDir the harness passes.
  */
object Catalog {

  /** List a prefix and derive (table_name, size_bytes) per object. */
  def fileIndex(spark: SparkSession, globPath: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(globPath)
      .select(
        regexp_extract($"path", "([a-z]+)\\.parquet$", 1).as("table_name"),
        $"length".as("size_bytes"))
  }

  private val pinnedDir = "/root/testdata/sf0.01"

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q39_file_index" -> ((s, _) =>
      fileIndex(s, s"$pinnedDir/*.parquet").drop("size_bytes"))
  )

  def oracles: Map[String, String] = Map(
    "q39_file_index" ->
      s"""SELECT regexp_extract(file, '([a-z]+)\\.parquet$$', 1) AS table_name
         |FROM glob('$pinnedDir/*.parquet')""".stripMargin
  )
}
