package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fp, WeightedBucket}
import graft.operators.Sampling

class FunctionsSpec extends SparkSpec {

  test("WeightedBucket (binary search codegen) == when-chain on every row") {
    import spark.implicits._
    val u = Fp.detUniform("w1g", $"doc_id")
    val both = tables.documents.select(
      $"doc_id",
      WeightedBucket(u, Sampling.garments).as("native"),
      Sampling.weightedChoice("w1g", $"doc_id", Sampling.garments).as("chain"))
    assert(both.filter($"native" =!= $"chain").count() == 0)
  }

  test("WeightedBucket handles boundary uniforms (0.0 and just-below-1.0)") {
    import spark.implicits._
    val items = Seq("a" -> 0.5, "b" -> 0.5)
    val df = Seq(0.0, 0.499999, 0.5, 0.999999).toDF("u")
    val got = df.select(WeightedBucket($"u", items).as("x"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a", "a", "b", "b"))
  }

  test("ArgminCentroid/ProbeCentroids == the struct-array formulation, ties by cid") {
    import spark.implicits._
    import graft.operators.Similarity
    import graft.functions.VecExprs
    val e = tables.embeddings
      .select($"vec_id", Similarity.quantize($"embedding").as("v"))
      .withColumn("nsq", Similarity.normSqQ($"v"))
    // Centroids = the first 8 corpus vectors, PLUS an exact duplicate of
    // centroid 0 under a higher cid — a guaranteed distance tie that the
    // (dist, cid) tiebreak must resolve to the LOWER cid on both paths.
    val base = e.orderBy($"vec_id").limit(8).collect()
      .map(r => r.getSeq[Long](1).toArray)
    val cents: Seq[(Long, Array[Long])] =
      base.zipWithIndex.map { case (cv, i) => (i.toLong, cv) }.toSeq :+
        (99L, base(0))
    // The legacy shape ArgminCentroid replaced (round-11): one literal-dot
    // struct per centroid, array_min over the (dist, cid) structs.
    def legacyStructs = array(cents.map { case (cid, cv) =>
      val cnsq = cv.map(x => x * x).sum
      struct(($"nsq" + lit(cnsq) - lit(2L) * VecExprs.dotQ($"v", typedlit(cv.toSeq)))
        .as("dist"), lit(cid).as("cid"))
    }: _*)
    val both = e.select($"vec_id",
      VecExprs.argminCentroid($"v", cents).as("native"),
      array_min(legacyStructs).getField("cid").as("legacy"),
      VecExprs.probeCentroids($"v", cents, 3).as("nativeProbes"),
      transform(slice(array_sort(legacyStructs), 1, 3), s => s.getField("cid"))
        .as("legacyProbes"))
    assert(both.filter($"native" =!= $"legacy").count() == 0)
    assert(both.filter(!($"nativeProbes" === $"legacyProbes")).count() == 0)
    // The planted tie never resolves to cid 99 (its twin cid 0 wins)...
    assert(both.filter($"native" === 99L).count() == 0)
    // ...and vec_id 0 — exactly centroid 0 — proves the tie was real:
    // both 0 and 99 are at distance 0, and the probe list orders 0 first.
    val v0 = both.filter($"vec_id" === 0L).collect()(0)
    assert(v0.getAs[Long]("native") == 0L)
    assert(v0.getSeq[Long](v0.fieldIndex("nativeProbes")).take(2) == Seq(0L, 99L))
    // nprobe > nlist caps at nlist, preserving order.
    val capped = e.select(
      VecExprs.probeCentroids($"v", cents, 100).as("p")).collect()
    assert(capped.forall(_.getSeq[Long](0).length == cents.length))
  }

  test("ArgminCentroidHier: bit-equal to flat argmin at full group probes, for any partition") {
    import spark.implicits._
    import graft.operators.Similarity
    import graft.functions.VecExprs
    val e = tables.embeddings
      .select($"vec_id", Similarity.quantize($"embedding").as("v"))
    val base = e.orderBy($"vec_id").limit(12).collect()
      .map(r => r.getSeq[Long](1).toArray)
    // Planted cross-group tie: cid 99 duplicates centroid 0's vector but
    // lives in a DIFFERENT group — at full probes both groups are
    // descended and the (dist, cid) tiebreak must pick 0, exactly as the
    // flat argmin does.
    val cents: Seq[(Long, Array[Long])] =
      base.zipWithIndex.map { case (cv, i) => (i.toLong, cv) }.toSeq :+
        (99L, base(0))
    val groups = Seq(cents.take(5), cents.slice(5, 10), cents.drop(10))
    // DELIBERATELY arbitrary group centroids (first member each): with
    // gProbes >= ngroups every group is descended, so equality with the
    // flat argmin must hold for ANY partition and ANY group centroids —
    // the exactness anchor does not depend on grouping quality.
    val gc = groups.map(_.head._2)
    val both = e.select($"vec_id",
      VecExprs.argminCentroid($"v", cents).as("flat"),
      VecExprs.argminCentroidHier($"v", gc, groups, 3).as("hierAll"),
      VecExprs.argminCentroidHier($"v", gc, groups, 1).as("hier1"))
    assert(both.filter($"flat" =!= $"hierAll").count() == 0)
    // gProbes=1 is approximate but must return a real member cid,
    // deterministically.
    val cidSet = cents.map(_._1).toSet
    val h1 = both.select($"vec_id", $"hier1").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(h1.forall { case (_, c) => cidSet.contains(c) })
    val h1again = e.select($"vec_id",
      VecExprs.argminCentroidHier($"v", gc, groups, 1).as("hier1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(h1.toMap == h1again.toMap)
    // ProbeCentroidsHier: full group probes == flat probe order exactly
    // (same (dist, cid) member ordering, any partition)...
    val probes = e.select($"vec_id",
      VecExprs.probeCentroids($"v", cents, 5).as("flatP"),
      VecExprs.probeCentroidsHier($"v", gc, groups, 3, 5).as("hierP"),
      VecExprs.probeCentroidsHier($"v", gc, groups, 1, 7).as("hierCov"))
    assert(probes.filter(!($"flatP" === $"hierP")).count() == 0)
    // ...and the coverage rule: gProbes=1 with nprobe=7 > any single
    // group's 5 members must still descend far enough to return 7 lists.
    assert(probes.select(size($"hierCov")).collect()
      .forall(_.getInt(0) == 7))
  }

  test("PqAdcLut == the map-of-literal-dots formulation, with a cid gap") {
    import spark.implicits._
    import graft.operators.Similarity
    import graft.functions.VecExprs
    val e = tables.embeddings
      .select($"vec_id", slice(Similarity.quantize($"embedding"), 1, 8).as("sv"))
    // Codebook with a HOLE at cid 2 — the shape Lloyd leaves when a
    // centroid empties — so positional indexing must survive
    // non-contiguous cids exactly like the map lookup it replaced.
    val base = e.orderBy($"vec_id").limit(3).collect()
      .map(_.getSeq[Long](1).toArray)
    val cents: Seq[(Long, Array[Long])] =
      Seq((0L, base(0)), (1L, base(1)), (3L, base(2)))
    val legacyMap = map_from_arrays(typedlit(cents.map(_._1)),
      array(cents.map { case (_, cv) => VecExprs.dotQ($"sv", typedlit(cv.toSeq)) }: _*))
    val checks = cents.map { case (cid, _) =>
      (element_at(VecExprs.pqAdcLut($"sv", cents), lit(cid.toInt + 1)) ===
        element_at(legacyMap, lit(cid))).as(s"eq$cid")
    }
    val both = e.select(checks: _*)
    cents.foreach { case (cid, _) =>
      assert(both.filter(!col(s"eq$cid")).count() == 0, s"cid $cid mismatch")
    }
    // The hole (cid 2 → position 3) reads 0, and the array is exactly
    // max-cid+1 wide — never silently truncated.
    val lut = e.select(VecExprs.pqAdcLut($"sv", cents).as("lut"))
      .collect()(0).getSeq[Long](0)
    assert(lut.length == 4 && lut(2) == 0L)
  }

  test("WeightedReservoir equals the window formulation (same ES keys)") {
    import spark.implicits._
    val viaAgg = Sampling.weightedReservoirPerType(tables.events, 5)
      .collect()
      .map(r => r.getString(0) -> r.getString(1).split(",").map(_.toLong).toSeq)
      .toMap
    val esKey = pow(Fp.detUniform("res", $"event_id"),
      lit(1.0) / ($"value" + lit(1.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy(col("k").desc, $"event_id".asc)
    val viaWindow = tables.events
      .select($"event_type", $"event_id", esKey.as("k"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .groupBy($"event_type")
      .agg(collect_list(struct($"rk", $"event_id")).as("xs"))
      .collect().map { r =>
        r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1).sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
      }.toMap
    assert(viaAgg == viaWindow)
  }

  test("WeightedReservoir is partitioning-invariant") {
    import spark.implicits._
    val a = Sampling.weightedReservoirPerType(tables.events.repartition(1), 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = Sampling.weightedReservoirPerType(tables.events.repartition(13), 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b)
  }
}
