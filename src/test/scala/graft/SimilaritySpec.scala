package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Banded-LSH near-dup quality: parameter derivation, and measured recall
  * of the blocked path against the brute-force ground truth (the oracle
  * only proves Spark and DuckDB agree on the SAME approximation; recall
  * vs exact is a property only a spec can check).
  */
class SimilaritySpec extends SparkSpec {

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("lshParams: planes track corpus size, bands track the threshold") {
    // The q59 geometry: 500 vectors at cos >= 0.35 -> 4 planes (expected
    // bucket occupancy ~32), 20 bands (>= 0.95 catch probability at the
    // threshold).
    assert(Similarity.lshParams(500, 0.35) == (20, 4))
    // Planes never shrink as the corpus grows (until the band cap bites).
    val planes = Seq(100L, 1000L, 10000L, 100000L)
      .map(n => Similarity.lshParams(n, 0.9)._2)
    assert(planes == planes.sorted)
    // Low thresholds make per-band collisions rare; the band cap bounds
    // the work multiplier instead of letting B explode.
    val (b, p) = Similarity.lshParams(1000000L, 0.35)
    assert(b <= 64 && p >= 1)
    // Higher threshold -> higher per-plane collision prob -> fewer bands
    // needed at the same corpus size.
    assert(Similarity.lshParams(500, 0.9)._1 < Similarity.lshParams(500, 0.35)._1)
  }

  test("cosineNearDups: recall >= 0.9 vs brute force at the q59 threshold") {
    import spark.implicits._
    val e = tables.embeddings
    val q = e.select($"vec_id", Similarity.quantize($"embedding").as("v"))
    val qn = q.withColumn("nsq", Similarity.normSqQ($"v"))
    val brute = qn.as("x").join(broadcast(qn.as("y")),
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        (Similarity.dotQ(col("x.v"), col("y.v")).cast("double") /
          sqrt(col("x.nsq").cast("double")) /
          sqrt(col("y.nsq").cast("double"))).as("cos"))
      .filter($"cos" >= 0.35)
    val truePairs = pairSet(brute)
    assert(truePairs.nonEmpty)

    val found = pairSet(Similarity.cosineNearDupsAuto(e, 0.35))
    // The exact-cosine verify makes false positives impossible.
    assert(found.subsetOf(truePairs))
    val recall = found.size.toDouble / truePairs.size
    assert(recall >= 0.9,
      s"recall $recall (${found.size}/${truePairs.size} true pairs)")

    // Deterministic: md5-derived hyperplanes, no RNG state.
    assert(pairSet(Similarity.cosineNearDupsAuto(e, 0.35)) == found)
  }
}
