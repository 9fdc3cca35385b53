package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Partitioned sinks (reference §2.2: per-product JSON metadata K1 at
  * /root/reference/data_pipeline/zalando_gallery_scraper_s3.py:461-468,
  * Hive-style S3 product layout K2 at :133-158, per-record text K4 at
  * prompts_parser.py:63-73).
  *
  * Scale notes: partitionBy gives the reference's `products/{id}/` layout
  * natively and enables partition pruning on read-back. One-file-per-key
  * parity (the reference writes exactly one JSON per product) comes from
  * repartitioning on the partition column first — each task then owns
  * whole keys. On S3 this pairs with a v2/magic committer; the layout and
  * code are identical, only the committer config changes.
  */
object Sinks {

  /** K1: per-key JSON metadata tree `outDir/<keyCol>=<value>/part-*.json`,
    * one file per key via pre-repartitioning on the key.
    */
  def writePartitionedJson(df: DataFrame, keyCol: String, outDir: String): Unit =
    df.repartition(col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(keyCol)
      .json(outDir)

  /** K1 with exact filename parity: one `outDir/<key>.json` file per
    * distinct key — the reference's `metadata/{product_id}.json` layout
    * (zalando_gallery_scraper_s3.py:461-468), not Hive `key=value/part-*`
    * directories. Rows are serialized with to_json (codegen) and a key's
    * rows land in one JSONL file (one object per line; the reference's
    * one-dict-per-product case is the one-row-per-key instance).
    *
    * Scale shape: repartition on the key puts every key's rows in exactly
    * one task, then each task streams its keys out through the Hadoop
    * FileSystem API — works on local paths here and object stores on a
    * cluster, writes fully distributed, no driver collect. Distinct keys
    * per task stay bounded by the shuffle partitioning, and each file is
    * opened once (rows arrive key-clustered only per shuffle partition,
    * so writers are kept open per key until the partition ends).
    *
    * Concurrency: this sink bypasses Spark's output committer (the
    * committer's part-file naming is exactly what filename parity forbids)
    * but keeps the committer's attempt isolation — each task attempt
    * writes `_tmp/<key>.json.<taskAttemptId>` and publishes by rename
    * after the file is complete. A retry or speculative twin therefore
    * can never interleave bytes into a reader-visible file: the final
    * `<key>.json` only ever appears as one attempt's complete output
    * (rename is atomic on HDFS/local; on rename-refuses-overwrite
    * filesystems the loser deletes its temp, on POSIX-overwrite semantics
    * the twin replaces a byte-equal file — byte-equal because rows are
    * sorted within each partition below, so two attempts over the same
    * shuffle partition serialize identical bytes even though shuffle
    * fetch order differs between attempts). Attempt temp litter is swept
    * with `_tmp` after the job; the underscore prefix keeps readers and
    * globs away from it in the meantime.
    */
  def writeJsonPerKey(df: DataFrame, keyCol: String, outDir: String): Unit = {
    val hc = df.sparkSession.sparkContext.hadoopConfiguration
    val root = new Path(outDir)
    val fs = root.getFileSystem(hc)
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    df.select(col(keyCol).cast("string").as("_k"),
        to_json(struct(df.columns.map(col): _*)).as("_js"))
      .repartition(col("_k"))
      // Deterministic file bytes: shuffle fetch order is not stable across
      // runs or attempts, so order each key's lines by content before
      // writing. Also clusters keys, so each writer is opened exactly once.
      .sortWithinPartitions(col("_k"), col("_js"))
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.nonEmpty) {
          // Executor-side FS handle; defaults come from the executor's
          // Hadoop conf on a real cluster, local FS here.
          val efs = new Path(outDir).getFileSystem(new Configuration())
          // No .crc sidecars — the whole point is exact filename parity.
          // (No-op on filesystems without client-side checksum files.)
          efs.setWriteChecksum(false)
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId().toString).getOrElse("driver")
          val open = scala.collection.mutable.Map.empty[
            String, (Path, java.io.BufferedWriter)]
          try rows.foreach { r =>
            val (_, w) = open.getOrElseUpdate(r.getString(0), {
              val t = new Path(new Path(outDir, "_tmp"),
                s"${r.getString(0)}.json.$attempt")
              (t, new java.io.BufferedWriter(new java.io.OutputStreamWriter(
                efs.create(t, true), java.nio.charset.StandardCharsets.UTF_8)))
            })
            w.write(r.getString(1)); w.newLine()
          } finally open.values.foreach { case (_, w) => w.close() }
          // Publish only after every file in the partition closed cleanly;
          // a throw above leaves nothing reader-visible.
          open.foreach { case (k, (tmp, _)) =>
            publishAtomic(efs, tmp, new Path(outDir, s"$k.json"))
          }
        }
      }
    fs.delete(new Path(root, "_tmp"), true)
  }

  /** Publish a complete task-attempt temp file at its final name. Rename
    * is atomic per FS contract; when the destination already exists
    * (a faster attempt won) either the FS refuses — then the loser's temp
    * is dropped — or POSIX semantics atomically replace a byte-equal file
    * (byte-equal by the sortWithinPartitions above). Either way readers
    * only ever observe one attempt's complete bytes. Only that genuine
    * lost race is swallowed: a rename that fails with NO destination
    * present (permissions, quota, transient FS error) throws, so the job
    * can't report success while a key's output was silently dropped.
    */
  private[graft] def publishAtomic(fs: FileSystem, tmp: Path,
      dest: Path): Unit =
    if (!fs.rename(tmp, dest)) {
      if (!fs.exists(dest))
        throw new java.io.IOException(
          s"failed to publish $tmp -> $dest and no winning attempt's " +
            "output is present")
      fs.delete(tmp, false)
    }

  /** Object-store committer configuration for the partitioned sinks (the
    * reference writes straight to S3; on Spark the equivalent durable
    * path is a zero-rename committer, since object-store "rename" is a
    * copy and the classic FileOutputCommitter is both slow and
    * non-atomic there).
    *
    * All keys are s3a-scheme-scoped, so the map can ship in a global
    * spark-defaults without affecting file:/hdfs: writes — `SinksSpec`
    * pins that by running the local sinks with it applied. The committer
    * classes themselves live in the `spark-hadoop-cloud` module +
    * `hadoop-aws` (standard in cloud distros, absent in this offline
    * environment, which is why there is no class-level contract test
    * here); deployments also set
    * `spark.sql.sources.commitProtocolClass=org.apache.spark.internal.io.cloud.PathOutputCommitProtocol`
    * and
    * `spark.sql.parquet.output.committer.class=org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter`
    * — those two are global (they route ALL datasource commits through
    * the path-output factory, which still picks the classic committer
    * for non-s3a schemes), documented here rather than returned because
    * they hard-require the cloud module on the classpath.
    *
    * `writeJsonPerKey`'s own temp+rename publish assumes real rename —
    * on S3 prefer `writePartitionedJson` (committer-managed) or point
    * the per-key tree at an HDFS/EFS-style staging path.
    */
  def s3aCommitterConf: Map[String, String] = Map(
    "spark.hadoop.fs.s3a.committer.name" -> "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled" -> "true",
    "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a" ->
      "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory")

  /** K2-style partitioned parquet (the engine-native bulk sink). */
  def writePartitionedParquet(df: DataFrame, keyCol: String, outDir: String): Unit =
    df.repartition(col(keyCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(keyCol)
      .parquet(outDir)

  /** Bucketed + sorted managed table — the co-located-join layout for
    * fact-fact joins at scale: two tables bucketed on the same key into
    * the same bucket count join with ZERO exchange (and with sortBy, zero
    * sort) — the shuffle is paid once at write time instead of per query.
    * Requires saveAsTable (bucket metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, keyCol: String, buckets: Int,
      table: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** K4: per-record text files keyed by an id column — the reference's
    * `{prompt_number}.txt` writer. partitionBy(id) + text gives the same
    * one-record-one-dir layout with distributed writes.
    */
  def writePerRecordText(df: DataFrame, idCol: String, textCol: String,
      outDir: String): Unit =
    df.select(col(idCol), col(textCol))
      .repartition(col(idCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(idCol)
      .text(outDir)
}
