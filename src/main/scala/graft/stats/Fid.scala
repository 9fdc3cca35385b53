package graft.stats

import breeze.linalg.{diag, eigSym, sum => bsum, trace, DenseMatrix, DenseVector}
import breeze.numerics.sqrt
import org.apache.spark.sql.DataFrame

/** Fréchet Inception Distance (reference A9,
  * /root/reference/experiments/standard_vton/metrics.py:254-274): the
  * distance between two Gaussian fits of feature distributions.
  *
  * Split by cost shape:
  *  - the distributed part ([[moments]]) reduces N×d features to (n, Σx,
  *    Σxxᵀ) with a per-partition fold + associative merge (treeReduce
  *    shape) — one pass, no shuffle of the corpus, merge order irrelevant
  *    up to float addition of d² partials;
  *  - the driver epilogue ([[fid]]) is dense O(d³) linear algebra on d×d
  *    matrices (eigendecompositions for the PSD matrix square roots) —
  *    putting this in the cluster would add nothing but serialization.
  */
object Fid {

  final case class Moments(n: Long, mean: DenseVector[Double],
      cov: DenseMatrix[Double])

  /** One-pass mean + covariance of an Array[Float] embedding column. */
  def moments(df: DataFrame, col: String = "embedding"): Moments = {
    val rdd = df.select(col).rdd
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val d = rdd.first().length
    // (n, sum, gram) accumulated per partition, merged associatively.
    val zero = (0L, new Array[Double](d), new Array[Double](d * d))
    val (n, s, g) = rdd.treeAggregate(zero)(
      seqOp = { case ((n, s, g), x) =>
        var i = 0
        while (i < d) {
          s(i) += x(i)
          var j = 0
          val base = i * d
          while (j < d) { g(base + j) += x(i) * x(j); j += 1 }
          i += 1
        }
        (n + 1, s, g)
      },
      combOp = { case ((n1, s1, g1), (n2, s2, g2)) =>
        var i = 0
        while (i < d) { s1(i) += s2(i); i += 1 }
        i = 0
        while (i < d * d) { g1(i) += g2(i); i += 1 }
        (n1 + n2, s1, g1)
      })
    require(n > 1, "need at least 2 rows for a covariance")
    val mean = new DenseVector(s.map(_ / n))
    val gram = new DenseMatrix(d, d, g) // row-major fill of symmetric matrix
    // Sample covariance (ddof=1) — np.cov's default, which the reference's
    // FID uses (metrics.py calculate_fid).
    val cov = (gram - (mean * mean.t) * n.toDouble) / (n - 1).toDouble
    Moments(n, mean, cov)
  }

  /** Square root of a symmetric PSD matrix via eigendecomposition;
    * negative eigenvalues from float noise are clamped to zero.
    */
  private def sqrtmPsd(m: DenseMatrix[Double]): DenseMatrix[Double] = {
    val es = eigSym((m + m.t) / 2.0)
    val clamped = es.eigenvalues.map(math.max(_, 0.0))
    es.eigenvectors * diag(sqrt(clamped)) * es.eigenvectors.t
  }

  /** FID = |μ₁−μ₂|² + tr(C₁ + C₂ − 2·(C₁^{1/2} C₂ C₁^{1/2})^{1/2}). */
  def fid(a: Moments, b: Moments): Double = {
    val diff = a.mean - b.mean
    val s1 = sqrtmPsd(a.cov)
    val inner = sqrtmPsd(s1 * b.cov * s1)
    bsum(diff *:* diff) + trace(a.cov) + trace(b.cov) - 2.0 * trace(inner)
  }

  /** Convenience: FID between two embedding DataFrames. */
  def fidBetween(a: DataFrame, b: DataFrame, col: String = "embedding"): Double =
    fid(moments(a, col), moments(b, col))
}
