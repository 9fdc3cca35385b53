package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class IvfSpec extends SparkSpec {

  test("IVF top-k: well-formed, deterministic, cos values match brute force") {
    import spark.implicits._
    val ivf = Similarity.cosineTopKIvf(tables.embeddings, 10, 3).collect()
    assert(ivf.nonEmpty)
    // Dense 1..k ranks per query among returned queries.
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val rks = rows.map(r => r.getLong(r.fieldIndex("rk"))).sorted.toSeq
      assert(rks == (1L to rks.size).toSeq)
    }
    // Scored cosines agree exactly with the brute-force scorer for the
    // same (qid, nid) pairs — IVF changes the candidate set, not the math.
    val brute = Similarity.cosineTopK(tables.embeddings, 10, 500)
      .select($"qid", $"nid", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(ivf.forall { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .forall(_ == r.getDouble(r.fieldIndex("cos")))
    })
    // Deterministic across runs (fixed kmeans seed, hash tie-breaks).
    val again = Similarity.cosineTopKIvf(tables.embeddings, 10, 3).collect()
    assert(again.map(_.toSeq).toSet == ivf.map(_.toSeq).toSet)
  }

  test("hierarchical coarse assignment: exact at full group probes; full-probe serving is partition-invariant") {
    import spark.implicits._
    val flat = Similarity.cosineTopKIvf(tables.embeddings, 10, 3)
      .collect().map(_.toSeq).toSet
    Similarity.releaseIndexes()
    sys.props("graft.hier.assign.min.lists") = "0"
    sys.props("graft.hier.assign.probes") = "1000000"
    try {
      // All groups probed -> assignment is bit-equal to the flat argmin,
      // so the whole operator result is identical.
      val hierAll = Similarity.cosineTopKIvf(tables.embeddings, 10, 3)
        .collect().map(_.toSeq).toSet
      assert(hierAll == flat)
      Similarity.releaseIndexes()
      // gProbes=2 is approximate near group boundaries, but with
      // nprobe = nlist EVERY list is scored, so any corpus partition
      // yields the same candidate set — results must match the flat
      // build exactly.
      sys.props("graft.hier.assign.probes") = "2"
      val fullProbeHier = Similarity.cosineTopKIvf(tables.embeddings,
        10, 3, nlist = 8, nprobe = 8).collect().map(_.toSeq).toSet
      Similarity.releaseIndexes()
      sys.props.remove("graft.hier.assign.min.lists")
      sys.props.remove("graft.hier.assign.probes")
      val fullProbeFlat = Similarity.cosineTopKIvf(tables.embeddings,
        10, 3, nlist = 8, nprobe = 8).collect().map(_.toSeq).toSet
      assert(fullProbeHier == fullProbeFlat)
    } finally {
      sys.props.remove("graft.hier.assign.min.lists")
      sys.props.remove("graft.hier.assign.probes")
      Similarity.releaseIndexes()
    }
  }

  test("semantic dedup: exact twins lose their higher id, cluster-local only") {
    import spark.implicits._
    val got = Similarity.semanticDedup(tables.embeddings, 0.35).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // Total verdict: every vector appears exactly once.
    assert(got.size == tables.embeddings.count())
    val dropped = got.filter(!_._2._2)
    assert(dropped.nonEmpty, "testdata plants near-dup embeddings")
    // The drop rule is keep-lowest-id: for every dropped vector there is
    // a kept-or-dropped SMALLER id in the same cluster at >= minCos; in
    // particular the minimum id of each cluster is always kept.
    val minIdPerCluster = got.groupBy(_._2._1).map { case (_, m) => m.keys.min }
    assert(minIdPerCluster.forall(id => got(id)._2))
    // Deterministic across runs (fixed seeds, integer math).
    val again = Similarity.semanticDedup(tables.embeddings, 0.35).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(again == got)
    Similarity.releaseIndexes()
  }

  test("semantic dedup hot-cluster guard: bounded prune work, keep-set preserved on planted hot mass") {
    import spark.implicits._
    // The degenerate corpus the r11 verdict named: 400 of 500 vectors
    // are EXACTLY identical (k-means cannot separate them — every seed
    // collapses to the same centroid and the argmin ties to one cid),
    // the other 100 are hash-spread. Unguarded, √n sizing puts the hot
    // mass in one cluster and the intra-cluster prune is 400² pairs.
    val hotEmb = Array.tabulate(64)(j => math.cos(j * 0.1).toFloat).toSeq
    // A real hash, not a linear formula — linear-congruential components
    // make distinct ids sample the same arithmetic progression at
    // different offsets, which produces genuinely near-dup pairs.
    def spread(id: Int, j: Int): Float =
      (scala.util.hashing.MurmurHash3.productHash((id, j)) % 1000) / 1000f
    val rows = (0 until 500).map { id =>
      if (id < 400) (id.toLong, hotEmb)
      else (id.toLong, Array.tabulate(64)(j => spread(id, j)).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val nlist = Similarity.semanticNlist(500) // 23; cap = 8·(500/23) = 168
    // guardMinPairs = 0: at test scale the 400² = 160k-pair hot list is
    // far below the production 2²⁶ absolute floor (the guard would —
    // correctly — early-exit and just run the affordable prune); forcing
    // the budget-only criterion exercises the split/salt/merge machinery
    // the test exists to prove.
    val res = Similarity.semanticDedupAt(df, 0.8, nlist,
        guardMinPairs = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(res.length == 500)
    // (a) Bounded prune work: the guard caps Σ|list|² at n·cap — the
    // designed n^1.5 budget — where unguarded the hot list alone is
    // 400² = 160000.
    val sizes = res.groupBy(_._2).map(_._2.size.toLong)
    val cap = 8L * (500L / nlist)
    assert(sizes.max <= cap, s"list over cap: ${sizes.max} > $cap")
    val pairWork = sizes.map(s => s * s).sum
    assert(pairWork <= 500L * cap, s"pair work $pairWork > ${500L * cap}")
    // (b) Keep-set semantics preserved: the identical mass keeps exactly
    // its minimum id — the salted chunks each drop to their minimum and
    // the survivor-merge pass collapses those to vec_id 0. Without the
    // merge this would keep one survivor PER CHUNK.
    val keptHot = res.filter(r => r._1 < 400 && r._3).map(_._1).toSet
    assert(keptHot == Set(0L), s"hot mass kept $keptHot, expected {0}")
    // Spread vectors are nowhere near cos 0.8 of anything — all kept.
    assert(res.filter(_._1 >= 400).forall(_._3))
    // (c) Deterministic across runs — salting offsets, sub-ids and the
    // merge are all hash/modulo-derived, nothing depends on collect
    // order or partitioning.
    val again = Similarity.semanticDedupAt(df, 0.8, nlist,
        guardMinPairs = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(again.toSet == res.toSet)
    val repart = Similarity.semanticDedupAt(df.repartition(7), 0.8, nlist,
        guardMinPairs = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(repart.toSet == res.toSet)
    // (d) On a balanced corpus the guard is inert: capFactor=8 and
    // capFactor=0 (guard off) agree bit-for-bit — the q92 oracle's
    // pinned replay stays valid.
    val guarded = Similarity.semanticDedupAt(tables.embeddings, 0.35, nlist)
      .collect().map(_.toSeq).toSet
    val unguarded = Similarity.semanticDedupAt(tables.embeddings, 0.35,
      nlist, capFactor = 0).collect().map(_.toSeq).toSet
    assert(guarded == unguarded)
    // (e) Absolute-floor early exit: at the PRODUCTION default
    // (guardMinPairs = 2²⁶) this planted corpus's 160k-pair hot list is
    // far below the floor, so the guard skips all split work and the
    // output — list ids included — is bit-identical to capFactor=0.
    // The keep-set is exact either way (the prune verifies every pair);
    // the floor only decides whether the affordable quadratic runs
    // unsplit.
    val defaulted = Similarity.semanticDedupAt(df, 0.8, nlist)
      .collect().map(_.toSeq).toSet
    val off = Similarity.semanticDedupAt(df, 0.8, nlist, capFactor = 0)
      .collect().map(_.toSeq).toSet
    assert(defaulted == off)
    Similarity.releaseIndexes()
  }

  test("sampled-training IVF: well-formed results, exact cosines, empty-sample fallback") {
    import spark.implicits._
    val sampled = Similarity.cosineTopKIvf(tables.embeddings, 10, 3,
      trainFrac = 0.5).collect()
    assert(sampled.nonEmpty)
    // The sample changes only WHICH centroids get trained — scored
    // cosines still agree exactly with brute force on the same pairs.
    val brute = Similarity.cosineTopK(tables.embeddings, 10, 500)
      .select($"qid", $"nid", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sampled.forall { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .forall(_ == r.getDouble(r.fieldIndex("cos")))
    })
    // Deterministic across runs: the training set is a pure hash of ids.
    val again = Similarity.cosineTopKIvf(tables.embeddings, 10, 3,
      trainFrac = 0.5).collect()
    assert(again.map(_.toSeq).toSet == sampled.map(_.toSeq).toSet)
    // A fraction so small the 500-vector sample is empty falls back to
    // full-corpus training: identical rows to trainFrac = 1.
    val tiny = Similarity.cosineTopKIvf(tables.embeddings, 10, 3,
      trainFrac = 1e-9).collect().map(_.toSeq).toSet
    val full = Similarity.cosineTopKIvf(tables.embeddings, 10, 3)
      .collect().map(_.toSeq).toSet
    assert(tiny == full)
  }

  test("cosineNearDupsFromIndex: exact pairs only, parquet round-trip, deterministic") {
    import spark.implicits._
    val emb = tables.embeddings
    val (cents, assigned) = Similarity.ivfIndex(emb)
    val batch = emb.filter($"vec_id" < 20)
    val served = Similarity.cosineNearDupsFromIndex(cents, assigned,
      batch, 0.35).collect()
    assert(served.nonEmpty, "testdata yields >= 0.35 pairs for the batch")
    // Verification is exact on quantized vectors, so every reported pair
    // must appear in the brute-force >= minCos set — zero false
    // positives; only recall is approximate (unprobed lists).
    val brute = Similarity.cosineTopK(emb, 20, 500)
      .filter($"cos" >= 0.35)
      .select($"qid", $"nid", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    served.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.get(key).contains(r.getDouble(2)),
        s"served pair $key not in the exact >= minCos set")
    }
    // Parquet round-trip serving (the actual deployment contract).
    val dir = java.nio.file.Files.createTempDirectory("servedup").toString
    cents.write.parquet(s"$dir/cents")
    assigned.write.parquet(s"$dir/assigned")
    val roundTrip = Similarity.cosineNearDupsFromIndex(
      spark.read.parquet(s"$dir/cents"), spark.read.parquet(s"$dir/assigned"),
      batch, 0.35).collect()
    assert(roundTrip.map(_.toSeq).toSet == served.map(_.toSeq).toSet)
    Similarity.releaseIndexes()
  }

  test("serving from a stored IVF index matches the one-shot operator") {
    import spark.implicits._
    // Build once, persist as parquet (the serving contract), query many.
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toFile
    val (cents, assigned) = Similarity.ivfIndex(tables.embeddings)
    cents.write.parquet(s"$dir/cents")
    assigned.write.parquet(s"$dir/assigned")
    val served = Similarity.cosineTopKIvfFromIndex(
        spark.read.parquet(s"$dir/cents"), spark.read.parquet(s"$dir/assigned"),
        tables.embeddings.filter($"vec_id" < 10), 3)
      .collect().map(_.toSeq).toSet
    val oneShot = Similarity.cosineTopKIvf(tables.embeddings, 10, 3)
      .collect().map(_.toSeq).toSet
    assert(served == oneShot && served.nonEmpty)
    // The serving split composes with sampled training the same way:
    // an index built at trainFrac serves the one-shot sampled answer.
    val (cs, as) = Similarity.ivfIndex(tables.embeddings, trainFrac = 0.5)
    cs.write.parquet(s"$dir/cents_s")
    as.write.parquet(s"$dir/assigned_s")
    val servedS = Similarity.cosineTopKIvfFromIndex(
        spark.read.parquet(s"$dir/cents_s"),
        spark.read.parquet(s"$dir/assigned_s"),
        tables.embeddings.filter($"vec_id" < 10), 3)
      .collect().map(_.toSeq).toSet
    val oneShotS = Similarity.cosineTopKIvf(tables.embeddings, 10, 3,
      trainFrac = 0.5).collect().map(_.toSeq).toSet
    assert(servedS == oneShotS && servedS.nonEmpty)
  }
}
