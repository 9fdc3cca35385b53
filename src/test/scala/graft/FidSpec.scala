package graft

import org.apache.spark.sql.functions._
import graft.stats.Fid

class FidSpec extends SparkSpec {

  test("FID of a distribution against itself is ~0") {
    val e = tables.embeddings
    val d = Fid.fidBetween(e, e)
    assert(math.abs(d) < 1e-6, s"self-FID was $d")
  }

  test("FID of a mean-shifted copy is ~ d * shift^2 (covariance unchanged)") {
    import spark.implicits._
    val e = tables.embeddings
    val shifted = e.withColumn("embedding",
      transform($"embedding", x => x + lit(0.5f)))
    val d = Fid.fidBetween(e, shifted)
    val expected = 64 * 0.25
    assert(math.abs(d - expected) < 0.1, s"got $d want ~$expected")
  }

  test("FID between different label populations is positive and symmetric") {
    import spark.implicits._
    val a = tables.embeddings.filter($"label" === 0)
    val b = tables.embeddings.filter($"label" === 1)
    val ab = Fid.fidBetween(a, b)
    val ba = Fid.fidBetween(b, a)
    assert(ab > 0.0)
    assert(math.abs(ab - ba) < 1e-6)
  }
}
