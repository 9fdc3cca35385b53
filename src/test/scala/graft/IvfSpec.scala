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
