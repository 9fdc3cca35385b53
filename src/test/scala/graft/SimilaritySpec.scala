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

  test("cosineNearDupClusters: transitive closure, min labels, keep flags") {
    import spark.implicits._
    // Planted chain: v100 ~ v101 ~ v102 where the ENDS are below the
    // threshold pairwise — only transitive closure puts all three in one
    // cluster. Exact geometry, not noise: v1 = cosθ·v0 + sinθ·e1 and
    // v2 = cosθ·v1 + sinθ·e2 with e2 ⊥ span(v0, v1), so adjacent pairs
    // sit at cosθ = 0.87 and the ends at exactly cos²θ = 0.7569 < 0.8.
    val dims = 64
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val a = Array.fill(dims)(rnd.nextGaussian())
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(x => (x / n).toFloat)
    }
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val (c, s) = (0.87, math.sqrt(1 - 0.87 * 0.87))
    def basis(vals: (Int, Double)*): Array[Float] = {
      val a = new Array[Float](dims)
      vals.foreach { case (j, v) => a(j) = v.toFloat }
      a
    }
    val v0 = basis(0 -> 1.0)
    val v1 = basis(0 -> c, 1 -> s)
    val v2 = basis(0 -> c * c, 1 -> c * s, 2 -> s)
    assert(cos(v0, v1) >= 0.85 && cos(v1, v2) >= 0.85)
    assert(cos(v0, v2) < 0.8, s"chain ends too close: ${cos(v0, v2)}")
    val base = (0 until 100).map(i => (i.toLong, unit()))
    val corpus = (base ++ Seq((100L, v0), (101L, v1), (102L, v2)))
      .toDF("vec_id", "embedding")

    val (b, p) = Similarity.lshParams(103, 0.8)
    val out = Similarity.cosineNearDupClusters(corpus, 0.8, b, p)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // One 3-cluster labeled by its minimum member, which is the keeper.
    assert(out(100L) == (100L, 3L, true), out(100L))
    assert(out(101L) == (100L, 3L, false))
    assert(out(102L) == (100L, 3L, false))
    // Background vectors are singletons keeping themselves.
    assert(out.size == 103)
    assert((0L until 100L).forall(i => out(i) == (i, 1L, true)))
  }

  test("driver-local training is bit-identical to the distributed Lloyd") {
    // The r17 local-training route (one collect + driver Lloyd when the
    // ppc-capped training set is driver-sized) must be a WORK-ALIKE of
    // the distributed path: same seeds, same argmin ordering, same
    // floor-of-double centroid update. Build the same indexes with the
    // route forced OFF (row bound 0) and ON, through the public index
    // builders, and require byte-equal centroid/codebook tables.
    val e = tables.embeddings
    def centSet(df: DataFrame): Set[(Long, Seq[Long])] =
      df.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    def books(df: DataFrame): Set[(Int, Long, Seq[Long])] =
      df.collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getSeq[Long](2))).toSet

    sys.props("graft.train.local.max.rows") = "0"
    Similarity.releaseIndexes()
    val (cD, aD) = Similarity.ivfIndex(e, nlist = 8, iters = 3)
    val (pcD, pbD, _) = Similarity.ivfPqIndex(e, nlist = 8, m = 4, ksub = 16)
    val centsDist = centSet(cD)
    val pqDist = books(pbD)
    val pqCentsDist = centSet(pcD)
    val assignedDist = aD.select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    sys.props.remove("graft.train.local.max.rows")
    Similarity.releaseIndexes()
    val (cL, aL) = Similarity.ivfIndex(e, nlist = 8, iters = 3)
    val (pcL, pbL, _) = Similarity.ivfPqIndex(e, nlist = 8, m = 4, ksub = 16)
    assert(centSet(cL) == centsDist)
    assert(centSet(pcL) == pqCentsDist)
    assert(books(pbL) == pqDist)
    assert(aL.select("vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == assignedDist)
    Similarity.releaseIndexes()
  }
}
