package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Inception Score (reference A10,
  * /root/reference/experiments/standard_vton/metrics.py:200-212):
  * exp(E[KL(p(y|x) ‖ p(y))]) computed over `splits` contiguous chunks of
  * the prediction set, reported as mean ± std across chunks.
  *
  * The reference feeds InceptionV3 softmax outputs; here any non-negative
  * score vector works — [[inceptionScore]] softmaxes the input column
  * per row first (the model stage that would produce real logits is the
  * same mapPartitions shape as stages/InferenceStage).
  *
  * Distributed shape, one pass per quantity:
  *  - per-row softmax: pure map work, no shuffle;
  *  - split marginal p(y): explode to (split, dim) and hash-aggregate —
  *    map-side combine reduces to splits×d cells regardless of corpus
  *    size;
  *  - per-row KL vs marginal: broadcast the (splits×d) marginal table
  *    back and fold zip_with(p, m, p·(ln p − ln m)) per row, then one
  *    aggregate per split.
  * Splits are assigned by dense-id arithmetic (floor(id·splits/n)), not a
  * global sort — the 100 TB path needs no ordering shuffle.
  */
object InceptionScore {

  /** Per-split scores: (split, n, kl_mean, score = exp(kl_mean)).
    * Eager (the result has ≤ splits rows): the interpreted per-row
    * softmax projection is persisted for its two consumers (marginal
    * aggregate + KL fold) and released before returning — the same
    * build-once pattern as the Dedup/Similarity index caches.
    */
  def perSplitScores(df: DataFrame, col: String = "embedding",
      idCol: String = "vec_id", splits: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = df.count()
    val probs = df.select(
        least(floor(org.apache.spark.sql.functions.col(idCol) * splits / n),
          lit(splits - 1)).cast("int").as("split"),
        softmaxCol(org.apache.spark.sql.functions.col(col)).as("p"))
      .persist()
    try {
      // Marginal p(y) per split: explode + aggregate (splits×d cells out).
      val marginal = probs
        .select($"split", posexplode($"p").as(Seq("i", "pi")))
        .groupBy($"split", $"i").agg(avg($"pi").as("mi"))
        .groupBy($"split")
        .agg(transform(array_sort(collect_list(struct($"i", $"mi"))),
          x => x.getField("mi")).as("m"))
      val rows = probs.join(broadcast(marginal), "split")
        .select($"split",
          aggregate(zip_with($"p", $"m", (p, m) =>
            when(p > 0d, p * (log(p) - log(m))).otherwise(lit(0d))),
            lit(0d), (acc, x) => acc + x).as("kl"))
        .groupBy($"split")
        .agg(count(lit(1)).as("n"), avg($"kl").as("kl_mean"))
        .withColumn("score", exp($"kl_mean"))
        .collect()
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("split",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("kl_mean",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType))))
    } finally probs.unpersist()
  }

  /** (mean, std) of the per-split scores — the reference's headline pair.
    * Population std (ddof=0), matching np.std's default in metrics.py.
    */
  def inceptionScore(df: DataFrame, col: String = "embedding",
      idCol: String = "vec_id", splits: Int = 10): (Double, Double) = {
    val scores = perSplitScores(df, col, idCol, splits)
      .select("score").collect().map(_.getDouble(0))
    val mean = scores.sum / scores.length
    val varPop = scores.map(s => (s - mean) * (s - mean)).sum / scores.length
    (mean, math.sqrt(varPop))
  }

  /** Row-wise stable softmax over a float/double array column. */
  private[stats] def softmaxCol(v: org.apache.spark.sql.Column) = {
    val mx = array_max(v).cast("double")
    val exps = transform(v, x => exp(x.cast("double") - mx))
    val z = aggregate(exps, lit(0d), (acc, x) => acc + x)
    transform(exps, x => x / z)
  }
}
