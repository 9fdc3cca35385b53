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

  test("hier argmin/probe equal their flat forms at full group probes, random vectors and partitions") {
    import spark.implicits._
    import graft.functions.VecExprs
    val dims = 8
    def vec() = Seq.fill(dims)((rnd.nextLong() % 500))
    // Random centroids with non-contiguous cids and a planted duplicate
    // vector under two different cids (cross-partition tie).
    val base = Seq.tabulate(17)(i => (i * 3L, vec().toArray))
    val cents = base :+ (997L, base(4)._2)
    // Random partition into 4 groups (fixed seed), arbitrary group reps.
    val shuffled = rnd.shuffle(cents)
    val groups = shuffled.grouped((shuffled.size + 3) / 4).toSeq
    val gc = groups.map(_.head._2)
    val rows = Seq.fill(80)(vec()).toDF("v")
    val got = rows.select(
      VecExprs.argminCentroid($"v", cents).as("flatA"),
      VecExprs.argminCentroidHier($"v", gc, groups, groups.size).as("hierA"),
      VecExprs.probeCentroids($"v", cents, 6).as("flatP"),
      VecExprs.probeCentroidsHier($"v", gc, groups, groups.size, 6)
        .as("hierP"))
    assert(got.filter($"flatA" =!= $"hierA").count() == 0)
    assert(got.filter(!($"flatP" === $"hierP")).count() == 0)
  }

  test("simhash widths are prefix-consistent: the low 16 bits of a 60-bit signature ARE the 16-bit signature") {
    // Bit j is the sign of the same ±1 sum at every width, so widening
    // only appends bits. Deployment consequence: persisted 60-bit state
    // can serve a legacy 16-bit probe by masking — widths interoperate
    // without re-signing the corpus.
    import spark.implicits._
    import graft.operators.Dedup
    val docs = tables.documents
    val s16 = Dedup.simhashes(docs, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s60 = Dedup.simhashes(docs, 60).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s16.keySet == s60.keySet && s16.nonEmpty)
    assert(s16.forall { case (id, s) => (s60(id) & 0xFFFFL) == s })
  }

  test("dot_q rejects non-long arrays at analysis time") {
    import spark.implicits._
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.functions.VecExprs.dotQ($"a", $"b")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<bigint>"), e.getMessage)
  }

  test("piiRedact is idempotent: placeholders never re-match any pattern") {
    import spark.implicits._
    val words = Vector("alpha", "beta", "10.2.3.4", "a@b.co", "x_1@mail.example.org",
      "555-123-4567", "v1.2.3", "12.5", "<EMAIL>", "192.168.0.1:8080", "a@@b.cc",
      "1.2.3.4.5", "555-12-34567", "%odd%", "..", "@", "end.")
    val cases = Seq.fill(120)(
      Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length))).mkString(" "))
    val rows = cases.toDF("s")
      .select(operators.TextAnalysis.piiRedact($"s").as("once"))
      .select($"once", operators.TextAnalysis.piiRedact($"once").as("twice"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r.getString(0)))
  }

  test("saltedJoin equals the plain join on random key distributions") {
    import spark.implicits._
    // Random fact/other pairs, including duplicate keys on both sides,
    // keys that match nothing, and salts 1 (degenerate) through 16.
    for (trial <- 0 until 5) {
      val fact = Seq.fill(200 + rnd.nextInt(200))(
        (rnd.nextInt(10).toLong, rnd.nextLong() % 1000)).toDF("k", "v")
      val other = Seq.fill(50 + rnd.nextInt(100))(
        (rnd.nextInt(14).toLong, rnd.nextLong() % 1000)).toDF("k", "w")
      val nSalts = Seq(1, 2, 8, 16)(trial % 4)
      for (jt <- Seq("inner", "left")) {
        val plain = fact.join(other, Seq("k"), jt)
          .select($"k", $"v", coalesce($"w", lit(Long.MinValue)).as("w"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sorted.toSeq
        val salted = operators.Skew.saltedJoin(fact, other, "k", nSalts, jt)
          .select($"k", $"v", coalesce($"w", lit(Long.MinValue)).as("w"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sorted.toSeq
        assert(salted == plain, s"trial=$trial salts=$nSalts type=$jt")
      }
    }
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

  test("cosineNearDupClusters on an empty corpus terminates empty") {
    val empty = tables.embeddings.filter(lit(false))
    val out = operators.Similarity.cosineNearDupClusters(empty, 0.8, 4, 2)
    assert(out.columns.toSeq ==
      Seq("vec_id", "cluster_id", "cluster_size", "keep"))
    assert(out.count() == 0)
  }

  test("MIH hamming join equals brute force across random widths, radii and chunk geometries") {
    import spark.implicits._
    // Random (bits, maxDist) geometries — including the 64-bit aHash
    // width whose top-bit masks stress the sign handling, and radii
    // wide enough that chunk counts from 1 to maxDist+1 all arise.
    val geoms = Seq((8, 2), (16, 3), (24, 6), (31, 4), (60, 5), (64, 7))
    for ((bits, maxDist) <- geoms) {
      val bound = if (bits == 64) -1L else (1L << bits) - 1
      // Cluster the signatures: random centers plus 1-2-bit mutations,
      // so the pair set is non-trivial at every geometry.
      val sigsSeq = (0 until 25).flatMap { i =>
        val s = rnd.nextLong() & bound
        Seq((i * 3L, s), (i * 3L + 1, s ^ (1L << rnd.nextInt(bits))),
          (i * 3L + 2,
            s ^ (1L << rnd.nextInt(bits)) ^ (1L << rnd.nextInt(bits))))
      }
      val sigs = sigsSeq.toDF("_id", "_sig")
      val brute = sigsSeq.flatMap { case (a, sa) =>
        sigsSeq.collect { case (b, sb) if a < b &&
            java.lang.Long.bitCount(sa ^ sb) <= maxDist =>
          (a, b, java.lang.Long.bitCount(sa ^ sb).toLong)
        }
      }.toSet
      assert(brute.nonEmpty, s"geometry ($bits,$maxDist) planted no pairs")
      // Every legal chunk count is exact (generalized pigeonhole); the
      // ball cap in mihChunks only ever REJECTS geometries, so sweep
      // the small chunk counts whose balls stay spec-sized.
      val sweep = (1 to (maxDist + 1)).filter { c =>
        val w = bits / c; val r = maxDist / c
        (0 to r).map(i =>
          (0 until i).map(j => (w - j).toDouble / (j + 1)).product)
          .sum <= 3000
      }
      for (c <- sweep) {
        val got = operators.Dedup
          .hammingNearPairsWithChunks(sigs, bits, maxDist, c)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSet
        assert(got == brute, s"($bits,$maxDist) chunks=$c diverged")
      }
      val auto = operators.Dedup
        .hammingNearPairs(sigs, "_id", "_sig", bits, maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(auto == brute, s"($bits,$maxDist) auto geometry diverged")
      operators.Dedup.releaseIndexes()
    }
  }
}
