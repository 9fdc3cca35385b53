package graft

import org.apache.spark.sql.functions._

/** Randomized (fixed-seed) equivalence tests for the native expressions
  * and empty-input regressions for the driver-side-looping operators.
  */
class PropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def randLongs(max: Int, bound: Long): Seq[Long] =
    Seq.fill(rnd.nextInt(max))(rnd.nextLong() % bound)

  test("intersect_count_sorted equals array_intersect size on sorted-distinct arrays") {
    import spark.implicits._
    val cases = Seq.fill(60)(
      (randLongs(40, 1000).distinct.sorted, randLongs(40, 1000).distinct.sorted))
    val rows = cases.toDF("a", "b")
      .select(
        graft.functions.VecExprs.intersectCountSorted($"a", $"b").as("c"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("dot_q equals the fold over the common prefix") {
    import spark.implicits._
    val cases = Seq.fill(60)((randLongs(70, 10000), randLongs(70, 10000)))
    val got = cases.toDF("a", "b")
      .select(graft.functions.VecExprs.dotQ($"a", $"b")).collect()
      .map(_.getLong(0))
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g == a.zip(b).map { case (x, y) => x * y }.sum)
    }
  }

  test("dot_q rejects non-long arrays at analysis time") {
    import spark.implicits._
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.VecExprs.dotQ($"a", $"b")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<bigint>"), e.getMessage)
  }

  test("nearDupClusters on an empty corpus terminates with an empty result") {
    val empty = tables.documents.filter(lit(false))
    assert(operators.Dedup.nearDupClusters(empty, 0.6).count() == 0)
  }

  test("cosineTopKIvf on an empty corpus returns the empty result") {
    val empty = tables.embeddings.filter(lit(false))
    val out = operators.Similarity.cosineTopKIvf(empty, 10, 3)
    assert(out.columns.toSeq == Seq("qid", "nid", "cos", "rk"))
    assert(out.count() == 0)
  }
}
