package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity.quantize

/** Distribution statistics over embedding columns — the relational core of
  * the reference's FID / Inception-Score metrics (A9/A10,
  * /root/reference/experiments/standard_vton/metrics.py:200-274): per-class
  * feature means/variances and deterministic split assignment.
  *
  * Exactness: all sums are over quantized integer components (see
  * Similarity.quantize) — associative and merge-order independent — and
  * every float output is one deterministic expression over those exact
  * sums. FID's remaining step (matrix sqrt of the covariance) is a
  * driver-side O(d³) dense-linear-algebra epilogue over the d×d matrix
  * this operator produces; it does not belong in the distributed plan.
  */
object VectorStats {

  /** Per-(label, dimension) mean and variance of quantized components:
    * the class-conditional feature moments FID consumes. One explode +
    * one hash aggregate — scales as rows×dims, no window.
    */
  def perLabelMoments(embeddings: DataFrame): DataFrame = {
    import embeddings.sparkSession.implicits._
    embeddings
      .select($"label", posexplode(quantize($"embedding")).as(Seq("dim", "q")))
      .groupBy($"label", $"dim")
      // Decimal sum of squares: exact at any scale, one double rounding at
      // the end (a double sum stops being order-independent past 2^53).
      .agg(count(lit(1)).as("n"), sum($"q").as("s"),
        sum($"q".cast("decimal(38,0)") * $"q").as("ssq_d"))
      .select($"label", $"dim".cast("long").as("dim"), $"n", $"s",
        $"ssq_d".cast("double").as("ssq"))
      .select($"label", $"dim", $"n",
        ($"s".cast("double") / $"n" / 1000.0).as("mean"),
        (($"ssq" / $"n" -
          ($"s".cast("double") / $"n") * ($"s".cast("double") / $"n"))
          / 1000000.0).as("variance"))
  }

  /** Deterministic k-way split + per-split label histogram — the
    * Inception-Score split machinery (A10: k contiguous chunks of the
    * vec_id order).
    *
    * Split assignment is dense-id arithmetic — floor(vec_id·k/n), the
    * same map-side formula as stats/InceptionScore — NOT ntile() over a
    * global Window.orderBy: an empty partitionBy funnels every row
    * through one task, a single-machine sort that caps the whole query
    * at 100 TB. The count() pre-pass is one map-side scan; the rest is
    * a plain hash aggregate. Splits are 1-based like ntile's.
    */
  def splitHistogram(embeddings: DataFrame, k: Int): DataFrame = {
    import embeddings.sparkSession.implicits._
    val n = embeddings.count()
    embeddings
      .withColumn("split",
        least(floor($"vec_id" * k / n), lit(k - 1)).cast("int") + 1)
      .groupBy($"split", $"label")
      .agg(count(lit(1)).as("n"))
      .select($"split".cast("long").as("split"), $"label", $"n")
  }

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q41_label_moments" -> ((s, d) => perLabelMoments(Tables.load(s, d).embeddings)),
    "q42_split_histogram" -> ((s, d) => splitHistogram(Tables.load(s, d).embeddings, 10))
  )

  def oracles: Map[String, String] = Map(
    "q41_label_moments" ->
      """WITH q AS (
        |  SELECT label,
        |    unnest(list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT))) AS qv,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings),
        |m AS (
        |  SELECT label, dim, COUNT(*) AS n, CAST(SUM(qv) AS BIGINT) AS s,
        |    CAST(SUM(CAST(qv AS HUGEINT) * qv) AS DOUBLE) AS ssq
        |  FROM q GROUP BY label, dim)
        |SELECT label, CAST(dim AS BIGINT) AS dim, n,
        |  CAST(s AS DOUBLE) / n / 1000.0 AS mean,
        |  (ssq / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) / 1000000.0 AS variance
        |FROM m""".stripMargin,
    "q42_split_histogram" ->
      """SELECT CAST(split AS BIGINT) AS split, label, COUNT(*) AS n FROM (
        |  SELECT label,
        |    LEAST(CAST(FLOOR(vec_id * 10 / (SELECT COUNT(*) FROM embeddings))
        |      AS BIGINT), 9) + 1 AS split
        |  FROM embeddings)
        |GROUP BY split, label""".stripMargin
  )
}
