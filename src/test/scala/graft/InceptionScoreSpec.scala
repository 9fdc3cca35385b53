package graft

import graft.stats.InceptionScore

class InceptionScoreSpec extends SparkSpec {

  /** Independent driver-side recomputation: collect, softmax, contiguous
    * splits, KL vs split marginal, exp(mean) — straight off the reference
    * formula (metrics.py:200-212).
    */
  private def reference(rows: Array[(Long, Array[Float])],
      splits: Int): (Double, Double) = {
    val n = rows.length
    val probs = rows.sortBy(_._1).map { case (id, v) =>
      val mx = v.max.toDouble
      val e = v.map(x => math.exp(x - mx))
      val z = e.sum
      (id, e.map(_ / z))
    }
    val scores = (0 until splits).map { s =>
      val chunk = probs.filter { case (id, _) =>
        math.min(id * splits / n, splits - 1L) == s
      }.map(_._2)
      val d = chunk.head.length
      val m = Array.tabulate(d)(i => chunk.map(_(i)).sum / chunk.length)
      val kls = chunk.map(p =>
        p.indices.map(i =>
          if (p(i) > 0) p(i) * (math.log(p(i)) - math.log(m(i))) else 0.0).sum)
      math.exp(kls.sum / kls.length)
    }
    val mean = scores.sum / splits
    (mean, math.sqrt(scores.map(x => (x - mean) * (x - mean)).sum / splits))
  }

  test("matches a driver-side recomputation of the reference formula") {
    val e = tables.embeddings
    val (m, s) = InceptionScore.inceptionScore(e, splits = 10)
    val collected = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (rm, rs) = reference(collected, 10)
    assert(math.abs(m - rm) < 1e-6, s"mean $m vs reference $rm")
    assert(math.abs(s - rs) < 1e-6, s"std $s vs reference $rs")
  }

  test("identical distributions per split give score ~1 (KL ~ 0)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Every row the same vector: p == marginal, KL = 0, score = e^0 = 1.
    val const = tables.embeddings.select($"vec_id",
      transform(sequence(lit(0), lit(7)), i => lit(0.5f)).as("embedding"))
    val (m, s) = InceptionScore.inceptionScore(const, splits = 5)
    assert(math.abs(m - 1.0) < 1e-12)
    assert(s < 1e-12)
  }

  test("per-split scores are >= 1 and splits are balanced") {
    val per = InceptionScore.perSplitScores(tables.embeddings, splits = 10)
      .collect()
    assert(per.length == 10)
    val counts = per.map(r => r.getAs[Long]("n"))
    assert(counts.max - counts.min <= 1, s"unbalanced: ${counts.mkString(",")}")
    per.foreach(r => assert(r.getAs[Double]("score") >= 1.0 - 1e-12))
  }
}
