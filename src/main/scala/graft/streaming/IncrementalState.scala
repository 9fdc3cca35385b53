package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-incremental resume state: the reference's checkpointed
  * processed-keys workflow (D2-D4: scraped_urls / seen_image_hashes sets
  * persisted every N items, /root/reference/data_pipeline/scrapers/
  * any_scraper.py:103-116, 585-597, resume check at
  * zalando_gallery_scraper_s3.py:430-432) as a reusable component.
  *
  * State is a parquet table of processed keys. A processing run is:
  *   1. [[newKeys]] — anti-join the incoming batch against the state
  *      (exactly the reference's "skip if already scraped");
  *   2. process only those rows;
  *   3. [[commit]] — append the newly-processed keys.
  *
  * Scale: the state table holds only key columns (compact); the anti-join
  * broadcasts when small and shuffles on the key otherwise — Catalyst
  * decides. Appends are new parquet files (no rewrite). For event-stream
  * dedup with TTL semantics use Streams.dedupStream instead; this helper
  * is the restartable-batch face.
  */
final class IncrementalState(spark: SparkSession, path: String,
    keyCols: Seq[String]) {

  private def stateExists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Current processed-key set; None before the first commit (key types
    * are whatever was committed — no schema is assumed).
    */
  def processed(): Option[DataFrame] =
    if (stateExists)
      Some(spark.read.parquet(path).select(keyCols.map(col): _*).distinct())
    else None

  /** Rows of `batch` whose key has not been processed yet. */
  def newKeys(batch: DataFrame): DataFrame =
    processed().fold(batch)(st => batch.join(st, keyCols, "left_anti"))

  /** Record keys as processed (append-only, idempotent per re-commit of
    * the same keys thanks to the distinct() in [[processed]]).
    */
  def commit(processedBatch: DataFrame): Unit =
    processedBatch.select(keyCols.map(col): _*).distinct()
      .write.mode(SaveMode.Append).parquet(path)
}
