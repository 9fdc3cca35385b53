package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal asset handling: images/audio/video as opaque binary columns
  * with typed metadata (reference S4 directory scan at
  * /root/reference/data_pipeline/utils/image_utils.py:61-67, S7 binary
  * download, M7 decode/resize at image_utils.py:31-35, F1/F2 quality
  * filters at image_utils.py:12-29).
  *
  * The Spark-side plumbing (schema, partition-parallel scan, pruned
  * columns) is real; the pixel decode itself is STUBBED with a
  * deterministic fake (this container has no imaging libraries). The stub
  * preserves the exact operator shape: a per-row decode producing
  * (width, height, ok) that downstream quality filters consume — swap
  * [[decodeStub]] for a javax.imageio/mapInPandas implementation in
  * production and nothing else changes.
  */
object BinaryAssets {

  /** Directory scan of binary assets: path, length, modificationTime,
    * content. binaryFile prunes `content` when unused, so listing-style
    * queries never read the bytes.
    */
  def scan(spark: SparkSession, globPath: String, pathGlobFilter: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", pathGlobFilter)
      .load(globPath)

  /** Asset-id extraction from the path (reference T1 multi-pattern
    * cascade, any_scraper.py:161-196): basename without extension, with an
    * md5 fallback for unparseable paths.
    */
  def assetId(path: Column): Column =
    coalesce(nullif(regexp_extract(path, "([^/]+)\\.[a-zA-Z0-9]+$", 1), lit("")),
      md5(path))

  /** STUB decode: deterministic fake dimensions derived from content bytes
    * (xxhash64 → bounded ints). Real impl: javax.imageio in mapPartitions,
    * or mapInPandas + PIL on a cluster with imaging libs. Returns a struct
    * (width, height, ok) like a real decoder that can fail.
    */
  def decodeStub(content: Column): Column = {
    val h = abs(xxhash64(content))
    struct(
      (h % 1600 + 200).cast("int").as("width"),
      ((h / 1600) % 1600 + 200).cast("int").as("height"),
      (length(content) > 0).as("ok"))
  }

  /** Min-resolution predicate (reference F1: reject below min side). */
  def minResolution(dims: Column, minW: Int, minH: Int): Column =
    dims.getField("ok") &&
      dims.getField("width") >= minW && dims.getField("height") >= minH

  /** Aspect-ratio whitelist ± tolerance (reference F2: any of the allowed
    * ratios within 0.05), as a higher-order exists over a literal ratio
    * array — no UDF.
    */
  def aspectRatioOk(dims: Column, ratios: Seq[(Int, Int)], tol: Double): Column = {
    val ratioArr = array(ratios.map { case (w, h) => lit(w.toDouble / h) }: _*)
    exists(ratioArr, r =>
      abs(dims.getField("width").cast("double") / dims.getField("height") - r) < tol)
  }

  /** Full ingest: scan → id → decode-stub → quality filters → indexed
    * gallery (reference R1 per-product image index).
    */
  def ingestImages(spark: SparkSession, globPath: String): DataFrame = {
    import spark.implicits._
    scan(spark, globPath)
      .select($"path", $"length", $"content")
      .withColumn("asset_id", assetId($"path"))
      .withColumn("dims", decodeStub($"content"))
      .filter(minResolution($"dims", 400, 400))
      .filter(aspectRatioOk($"dims", Seq((3, 4), (4, 5), (1, 1), (1, 2), (2, 1), (3, 1), (1, 3)), 0.6))
  }
}
