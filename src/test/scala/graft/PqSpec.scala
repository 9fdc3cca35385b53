package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.Fp

class PqSpec extends SparkSpec {

  test("PQ top-k: well-formed, deterministic across runs and partitionings") {
    import spark.implicits._
    val pq = Similarity.cosineTopKPq(tables.embeddings, 10, 3).collect()
    assert(pq.nonEmpty)
    // Dense 1..k ranks per query.
    pq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val rks = rows.map(r => r.getLong(r.fieldIndex("rk"))).sorted.toSeq
      assert(rks == (1L to rks.size).toSeq)
    }
    // Deterministic: codebooks are hash-seeded integer Lloyd, codes and
    // ADC sums are exact integers — a second run and a differently
    // partitioned input give byte-identical rows.
    val again = Similarity.cosineTopKPq(tables.embeddings, 10, 3).collect()
    assert(again.map(_.toSeq).toSet == pq.map(_.toSeq).toSet)
    val repart = Similarity.cosineTopKPq(tables.embeddings.repartition(7), 10, 3)
      .collect()
    assert(repart.map(_.toSeq).toSet == pq.map(_.toSeq).toSet)
  }

  test("PQ retrieves within-cluster neighbors on clustered data") {
    import spark.implicits._
    // 8 well-separated clusters of 25 vectors: center c is hot on block c
    // (dims 8c..8c+7) with small deterministic per-member noise. PQ's
    // codebooks (8 centroids per 16-dim subspace) recover the cluster
    // structure, so ADC top-1 must come from the query's own cluster.
    def noise(id: Int, i: Int): Float =
      (((id * 31 + i * 17) % 7).toFloat - 3f) / 100f
    val rows = (0 until 200).map { id =>
      val c = id % 8
      val emb = Array.tabulate(64) { i =>
        (if (i / 8 == c) 1f else 0f) + noise(id, i)
      }
      (id.toLong, emb.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.cosineTopKPq(df, 8, 1).collect()
    assert(got.length == 8)
    got.foreach { r =>
      val qid = r.getLong(r.fieldIndex("qid"))
      val nid = r.getLong(r.fieldIndex("nid"))
      assert(nid % 8 == qid % 8,
        s"top-1 for query $qid came from cluster ${nid % 8}, not ${qid % 8}")
    }
    // The composed IVF-PQ must not lose the cluster either: the coarse
    // quantizer's probed lists have to contain the query's own cluster
    // for ADC to find it (8 centroids over 8 planted clusters, nprobe 2).
    val ivfpq = Similarity.cosineTopKIvfPq(df, 8, 1,
      nlist = 8, nprobe = 2, ksub = 8).collect()
    assert(ivfpq.length == 8)
    ivfpq.foreach { r =>
      val qid = r.getLong(r.fieldIndex("qid"))
      val nid = r.getLong(r.fieldIndex("nid"))
      assert(nid % 8 == qid % 8,
        s"IVF-PQ top-1 for query $qid came from cluster ${nid % 8}, not ${qid % 8}")
    }
    Similarity.releaseIndexes()
  }

  test("ADC approximation error is bounded vs exact cosine") {
    import spark.implicits._
    val pq = Similarity.cosineTopKPq(tables.embeddings, 10, 3)
      .select($"qid", $"nid", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    // Exact cosines for every (query, corpus) pair via the brute scorer.
    val exact = Similarity.cosineTopK(tables.embeddings, 10, 500)
      .select($"qid", $"nid", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // iid 64-dim data is PQ's worst case (nothing clusters), so the
    // bound is loose — but it still separates "lossy quantization" from
    // "broken arithmetic" (a sign/offset bug shows errors near 1).
    val errs = pq.map { case (k, c) => math.abs(c - exact(k)) }
    assert(errs.max <= 0.6, s"max ADC error ${errs.max}")
    assert(errs.sum / errs.length <= 0.3,
      s"mean ADC error ${errs.sum / errs.length}")
  }

  test("IVF-PQ: equals flat PQ at nprobe=nlist, prunes to probed lists otherwise") {
    import spark.implicits._
    // Codes encode raw vectors (by_residual=false), so probing EVERY list
    // makes the candidate set the whole corpus and the composed operator
    // must reproduce flat PQ bit-for-bit — the equality that proves the
    // coarse stage only prunes, never rescores.
    val flat = Similarity.cosineTopKPq(tables.embeddings, 10, 3)
      .collect().map(_.toSeq).toSet
    val all = Similarity.cosineTopKIvfPq(tables.embeddings, 10, 3,
      nlist = 16, nprobe = 16).collect().map(_.toSeq).toSet
    assert(all == flat && all.nonEmpty)
    // At nprobe < nlist results are well-formed (dense ranks) and every
    // scored cosine matches the flat-PQ ADC value for the same pair —
    // pruning changes the candidate set, not the arithmetic.
    val pruned = Similarity.cosineTopKIvfPq(tables.embeddings, 10, 3)
      .collect()
    assert(pruned.nonEmpty)
    pruned.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val rks = rows.map(r => r.getLong(r.fieldIndex("rk"))).sorted.toSeq
      assert(rks == (1L to rks.size).toSeq)
    }
    val flatCos = Similarity.cosineTopKPq(tables.embeddings, 10, 500)
      .select($"qid", $"nid", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pruned.forall { r =>
      flatCos.get((r.getLong(0), r.getLong(1)))
        .forall(_ == r.getDouble(r.fieldIndex("cos")))
    })
    // Deterministic across runs and partitionings, like both halves.
    val again = Similarity.cosineTopKIvfPq(tables.embeddings, 10, 3)
      .collect()
    assert(again.map(_.toSeq).toSet == pruned.map(_.toSeq).toSet)
    Similarity.releaseIndexes()
  }

  test("refined PQ/IVF-PQ: equals brute-force when candidates cover the corpus; never below plain-PQ recall") {
    import spark.implicits._
    // With k·kFactor >= n−1 the ADC cut keeps EVERY candidate pair, so
    // the refine stage re-ranks the whole corpus with exact integer dots
    // — the result must equal the brute-force scan bit-for-bit (the
    // degenerate-parameter identity, like IVF-PQ at nprobe=nlist).
    // Both identities run at the small 12-bit geometry explicitly — the
    // refined operators' own defaults are the 64-bit retrieval config,
    // which would only slow this degenerate-parameter proof down.
    val exact = Similarity.cosineTopK(tables.embeddings, 5, 3)
      .collect().map(_.toSeq).toSet
    val full = Similarity.cosineTopKPqRefined(tables.embeddings, 5, 3,
      kFactor = 200, m = 4, ksub = 8).collect().map(_.toSeq).toSet
    assert(full == exact && full.nonEmpty)
    val fullIvf = Similarity.cosineTopKIvfPqRefined(tables.embeddings, 5, 3,
      kFactor = 200, nlist = 16, nprobe = 16, m = 4, ksub = 8)
      .collect().map(_.toSeq).toSet
    assert(fullIvf == exact)
    // At the default kFactor the refined result can only gain recall:
    // a pair in both the ADC top-k and the exact top-k is in the ADC
    // top-R (R >= k), and fewer than k candidates can outrank it by
    // exact cosine (they'd be in the exact top-k too) — so it survives
    // the re-rank. Deterministic, so assertable as a strict superset
    // relation on the true-pair sets.
    def hits(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(exactPairs)
    lazy val exactPairs = Similarity.cosineTopK(tables.embeddings, 10, 3)
      .select($"qid", $"nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // The superset theorem holds only against the SAME codebooks, so the
    // refined side pins the plain operator's 12-bit geometry here.
    val plainHits = hits(Similarity.cosineTopKPq(tables.embeddings, 10, 3)
      .select($"qid", $"nid").collect())
    val refinedHits = hits(
      Similarity.cosineTopKPqRefined(tables.embeddings, 10, 3,
        kFactor = 8, m = 4, ksub = 8)
        .select($"qid", $"nid").collect())
    assert(plainHits.subsetOf(refinedHits),
      s"refine lost pairs: ${plainHits -- refinedHits}")
    // Deterministic across runs, like the rest of the family.
    val again = Similarity.cosineTopKPqRefined(tables.embeddings, 10, 3)
      .collect().map(_.toSeq).toSet
    val first = Similarity.cosineTopKPqRefined(tables.embeddings, 10, 3)
      .collect().map(_.toSeq).toSet
    assert(again == first)
    Similarity.releaseIndexes()
  }

  test("sampled PQ training: deterministic, tiny-sample fallback, composes with IVF-PQ") {
    // trainFrac is the q80 hash-cap knob applied to the PQ family: every
    // codebook (and the coarse quantizer in the composed operator) trains
    // on the same "ivftrain" half-sample, bounding index-build cost.
    val sampled = Similarity.cosineTopKPq(tables.embeddings, 10, 3,
      trainFrac = 0.5).collect()
    assert(sampled.nonEmpty)
    val again = Similarity.cosineTopKPq(tables.embeddings, 10, 3,
      trainFrac = 0.5).collect()
    assert(again.map(_.toSeq).toSet == sampled.map(_.toSeq).toSet)
    // A fraction so small the sample is empty falls back to full-corpus
    // training — identical rows to trainFrac = 1 (per subspace).
    val tiny = Similarity.cosineTopKPq(tables.embeddings, 10, 3,
      trainFrac = 1e-9).collect().map(_.toSeq).toSet
    val full = Similarity.cosineTopKPq(tables.embeddings, 10, 3)
      .collect().map(_.toSeq).toSet
    assert(tiny == full)
    // The nprobe=nlist equality holds under sampled training too — the
    // sample changes WHICH codebooks get trained, not the composition.
    val ivfpq = Similarity.cosineTopKIvfPq(tables.embeddings, 10, 3,
      nlist = 16, nprobe = 16, trainFrac = 0.5).collect().map(_.toSeq).toSet
    assert(ivfpq == sampled.map(_.toSeq).toSet)
    Similarity.releaseIndexes()
  }

  test("ivfPqIndex: parquet round-trip serving matches the one-shot operator") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfpqidx").toString
    val (cents, books, codes) = Similarity.ivfPqIndex(tables.embeddings)
    // The code table carries its list assignment — serving never touches
    // raw vectors or re-runs assignment.
    assert(codes.columns.toSeq ==
      Seq("vec_id", "c0", "c1", "c2", "c3", "list_id", "rnsq"))
    cents.write.parquet(s"$dir/cents")
    books.write.parquet(s"$dir/books")
    codes.write.parquet(s"$dir/codes")
    val served = Similarity.cosineTopKIvfPqFromIndex(
      spark.read.parquet(s"$dir/cents"), spark.read.parquet(s"$dir/books"),
      spark.read.parquet(s"$dir/codes"),
      tables.embeddings.filter($"vec_id" < 10), 3)
      .collect().map(_.toSeq).toSet
    val oneShot = Similarity.cosineTopKIvfPq(tables.embeddings, 10, 3)
      .collect().map(_.toSeq).toSet
    assert(served == oneShot && served.nonEmpty)
    Similarity.releaseIndexes()
  }

  test("pqIndex: duplicates share codes, the code table is compressed, serving matches one-shot") {
    import spark.implicits._
    // Two exact copies of each of 50 hash-derived vectors: identical
    // inputs MUST encode to identical code rows (the encoder is a pure
    // function of the vector and the codebooks).
    def comp(id: Int, i: Int): Float =
      (((id * 131 + i * 29) % 2001).toFloat - 1000f) / 1000f
    val rows = (0 until 50).flatMap { b =>
      val emb = Array.tabulate(64)(i => comp(b, i)).toSeq
      Seq((b.toLong, emb), (b.toLong + 1000L, emb))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (books, codes) = Similarity.pqIndex(df)
    val byVec = codes.collect().map { r =>
      r.getLong(0) -> (1 to 4).map(r.getLong(_))
    }.toMap
    (0L until 50L).foreach { b =>
      assert(byVec(b) == byVec(b + 1000L),
        s"duplicate of $b encoded differently: ${byVec(b)} vs ${byVec(b + 1000L)}")
    }
    // Compression shape: the whole codebook is m×ksub rows, and the code
    // table's row payload is 4 codes + 1 norm — nothing vector-sized
    // survives into the serving set.
    assert(books.count() <= 4 * 8)
    assert(codes.columns.toSeq ==
      Seq("vec_id", "c0", "c1", "c2", "c3", "rnsq"))
    Similarity.releaseIndexes()

    // Serving from the persisted index reproduces the one-shot operator
    // bit-for-bit (same parquet round-trip contract as the IVF index).
    val dir = java.nio.file.Files.createTempDirectory("pqidx").toString
    val (b2, c2) = Similarity.pqIndex(tables.embeddings)
    b2.write.mode("overwrite").parquet(s"$dir/books")
    c2.write.mode("overwrite").parquet(s"$dir/codes")
    val served = Similarity.cosineTopKPqFromIndex(
      spark.read.parquet(s"$dir/books"), spark.read.parquet(s"$dir/codes"),
      tables.embeddings.filter($"vec_id" < 10), 3).collect()
    val oneShot = Similarity.cosineTopKPq(tables.embeddings, 10, 3).collect()
    assert(served.map(_.toSeq).toSet == oneShot.map(_.toSeq).toSet)
  }

  test("residual IVF-PQ: well-formed, deterministic, equals brute force at full coverage") {
    import spark.implicits._
    val res = Similarity.cosineTopKIvfPqResidualRefined(
      tables.embeddings, 10, 3).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val rks = rows.map(r => r.getLong(r.fieldIndex("rk"))).sorted.toSeq
      assert(rks == (1L to rks.size).toSeq)
    }
    // Refined cosines are EXACT (the refine stage re-scores with raw
    // integer dots), so every returned value matches brute force.
    val brute = Similarity.cosineTopK(tables.embeddings, 10, 500)
      .select($"qid", $"nid", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(res.forall { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .forall(_ == r.getDouble(r.fieldIndex("cos")))
    })
    val again = Similarity.cosineTopKIvfPqResidualRefined(
      tables.embeddings, 10, 3).collect()
    assert(again.map(_.toSeq).toSet == res.map(_.toSeq).toSet)
    // Full coverage (nprobe = nlist, candidates >= corpus) makes the
    // ADC stage irrelevant: the exact refine over everything IS brute
    // force — residual encoding must not break that ceiling.
    val full = Similarity.cosineTopKIvfPqResidualRefined(
        tables.embeddings, 10, 3, kFactor = 200, nlist = 4, nprobe = 4)
      .collect().map(_.toSeq).toSet
    val exact = Similarity.cosineTopK(tables.embeddings, 10, 3)
      .collect().map(_.toSeq).toSet
    assert(full == exact)
    Similarity.releaseIndexes()
  }

  test("residual cross-term delivery: the broadcast-join (large-nlist) path matches the literal path") {
    // Above crLiteralMaxEntries the nlist×ksub cross-term table is
    // computed distributedly and broadcast-joined instead of shipped as
    // plan Literals (√n coarse sizing reaches ~1 GB at 10⁹ vectors).
    // Entries must be identical integers either way, so the ADC
    // candidates — and therefore the refined rows — must match exactly.
    val lit = Similarity.cosineTopKIvfPqResidualRefined(
      tables.embeddings, 10, 3).collect().map(_.toSeq).toSet
    Similarity.releaseIndexes()
    sys.props("graft.cr.literal.max.entries") = "0"
    try {
      val joined = Similarity.cosineTopKIvfPqResidualRefined(
        tables.embeddings, 10, 3).collect().map(_.toSeq).toSet
      assert(joined == lit)
    } finally sys.props.remove("graft.cr.literal.max.entries")
    Similarity.releaseIndexes()
  }

  test("residual encoding quantizes clustered corpora better than direct encoding") {
    import spark.implicits._
    // Clustered data is where residuals matter — specifically when the
    // clusters OUTNUMBER ksub: a direct ksub=8 codebook cannot span 16
    // distinct cluster offsets per subspace, so direct ADC error is ~
    // the cluster separation, while the coarse quantizer absorbs every
    // offset and the residual codebook sees only the small
    // within-cluster spread (FAISS's by_residual rationale). Planted
    // geometry: 16 tight clusters at hash-spread centers, 32 points
    // each.
    def center(c: Int, j: Int): Float =
      (scala.util.hashing.MurmurHash3.productHash((c, j)) % 1000) / 250f
    def noise(id: Int, j: Int): Float = (((id * 31 + j * 17) % 11) - 5) / 50f
    val rows = (0 until 512).map { id =>
      val c = id % 16
      (id.toLong, Array.tabulate(64)(j => center(c, j) + noise(id, j)).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val exact = Similarity.cosineTopK(df, 20, 3)
      .select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(got: Array[org.apache.spark.sql.Row]): Double = {
      val g = got.map(r => (r.getLong(r.fieldIndex("qid")),
        r.getLong(r.fieldIndex("nid")))).toSet
      (g & exact).size.toDouble / exact.size
    }
    // kFactor=4 — the ADC stage must surface the true top-3 into its
    // top-12 for the exact refine to recover it; nlist=16 matches the
    // planted clusters and nprobe=16 removes probe loss, so the recall
    // difference is attributable to encoding alone.
    val plain = recallOf(Similarity.cosineTopKIvfPqRefined(df, 20, 3,
      kFactor = 4, nlist = 16, nprobe = 16, m = 4, ksub = 8).collect())
    val residual = recallOf(Similarity.cosineTopKIvfPqResidualRefined(
      df, 20, 3, kFactor = 4, nlist = 16, nprobe = 16, m = 4, ksub = 8)
      .collect())
    info(s"residual recall $residual vs direct $plain")
    assert(residual > plain + 0.1,
      s"residual recall $residual vs plain $plain — expected a clear gap")
    Similarity.releaseIndexes()
  }

  test("residual index: parquet round-trip serving matches one-shot; add reproduces build codes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ivfpqres").toString
    val (cents, books, codes) = Similarity.ivfPqResidualIndex(
      tables.embeddings, nlist = 16, m = 8, ksub = 256)
    assert(codes.columns.toSeq == Seq("vec_id", "c0", "c1", "c2", "c3",
      "c4", "c5", "c6", "c7", "list_id", "rnsq", "xnsq"))
    cents.write.parquet(s"$dir/cents")
    books.write.parquet(s"$dir/books")
    codes.write.parquet(s"$dir/codes")
    // Serve from the persisted index with the SAME queries the one-shot
    // uses (vec_id < 10 of the corpus) — identical rows bit-for-bit.
    val served = Similarity.cosineTopKIvfPqResidualRefinedFromIndex(
      spark.read.parquet(s"$dir/cents"), spark.read.parquet(s"$dir/books"),
      spark.read.parquet(s"$dir/codes"), tables.embeddings,
      tables.embeddings.filter($"vec_id" < 10), 3)
      .collect().map(_.toSeq).toSet
    val oneShot = Similarity.cosineTopKIvfPqResidualRefined(
      tables.embeddings, 10, 3).collect().map(_.toSeq).toSet
    assert(served == oneShot && served.nonEmpty)
    // The add path is the same pure encoder: re-encoding the build
    // corpus against the stored index reproduces its code rows.
    val added = Similarity.ivfPqResidualAdd(
      spark.read.parquet(s"$dir/cents"), spark.read.parquet(s"$dir/books"),
      tables.embeddings)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getLong(r.fieldIndex("vec_id")) ->
          ((0 to 7).map(s => r.getLong(r.fieldIndex(s"c$s"))),
            r.getLong(r.fieldIndex("list_id")),
            r.getLong(r.fieldIndex("xnsq")))
      }.toMap
    assert(keyed(added) == keyed(codes) && added.count() > 0)
    Similarity.releaseIndexes()
  }

  test("residual builders: empty corpus and empty codebooks return empty frames, no crash") {
    import spark.implicits._
    // The degenerate branches embed placeholder codebooks; the eager
    // driver-side cross-term table indexes book vectors positionally,
    // so the placeholders must be subspace-length — a regression here
    // throws IndexOutOfBoundsException at BUILD time, before the
    // filter(false) masks any row.
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val (c0, b0, k0) = Similarity.ivfPqResidualIndex(empty)
    assert(c0.count() == 0 && b0.count() == 0 && k0.count() == 0)
    // Add served against an empty stored index: same degenerate path.
    val one = Seq((1L, Seq.fill(64)(0.5f))).toDF("vec_id", "embedding")
    val added = Similarity.ivfPqResidualAdd(c0, b0, one)
    assert(added.count() == 0)
    Similarity.releaseIndexes()
  }

  test("annParams: pinned verify geometry, monotone in target, auto entry equals explicit geometry") {
    import spark.implicits._
    // The q99 oracle replays exactly this geometry — a drift here is a
    // CORRECTNESS failure, not just a recall change.
    assert(Similarity.annParams(500, 3, 0.9) ==
      Similarity.AnnGeometry(23, 14, 32, 8))
    // More recall never costs less index work.
    val targets = Seq(0.5, 0.7, 0.8, 0.9, 0.95)
    val geoms = targets.map(Similarity.annParams(20000, 3, _))
    assert(geoms.map(_.nprobe) == geoms.map(_.nprobe).sorted)
    assert(geoms.forall(g => g.nlist == 142 && g.m == 16))
    // Code length steps up with corpus size; candidates track cFrac·n.
    assert(Similarity.annParams(2000, 3, 0.9).m == 8)
    assert(Similarity.annParams(1000000, 3, 0.9).m == 16)
    assert(Similarity.annParams(1000000, 3, 0.9).kFactor == 1667)
    // r15 refit: the upper decades invert the curves MEASURED at
    // 200k/2M (RecallProbe lowf) instead of extrapolating the 2k fit —
    // the 2k-fitted fraction (0.394 at target 0.8) over-delivered
    // 0.953/0.963 there, at ~2.4x the needed serve cost. The verify
    // scale and the 2k/20k probes are pinned on the old curve above.
    assert(Similarity.annParams(200000, 3, 0.8).nprobe == 88)
    assert(Similarity.annParams(2000000, 3, 0.8).nprobe == 227) // was 554
    assert(Similarity.annParams(2000000, 3, 0.9).nprobe == 459) // was 839
    // Above the last measured decade the FRACTION clamps at the 2M
    // inversion (recall at fixed f only improves with n on every
    // measured pair of decades, so the last curve is the bound).
    val g20M = Similarity.annParams(20000000, 3, 0.8)
    assert(math.abs(g20M.nprobe.toDouble / g20M.nlist - 227.0 / 1415)
      < 0.002)
    // Monotone in target at the refit decades too.
    val bigGeoms = targets.map(Similarity.annParams(2000000, 3, _))
    assert(bigGeoms.map(_.nprobe) == bigGeoms.map(_.nprobe).sorted)
    // The auto entry point IS the residual operator at the derived
    // geometry — same rows bit-for-bit (residual because it measures
    // strictly better than direct at every probed point, the FAISS
    // by_residual default).
    val g = Similarity.annParams(500, 3, 0.9)
    val auto = Similarity.cosineTopKAuto(tables.embeddings, 10, 3, 0.9)
      .collect().map(_.toSeq).toSet
    val explicit = Similarity.cosineTopKIvfPqResidualRefined(
        tables.embeddings, 10, 3, kFactor = g.kFactor, nlist = g.nlist,
        nprobe = g.nprobe, m = g.m, ksub = 256)
      .collect().map(_.toSeq).toSet
    assert(auto == explicit && auto.nonEmpty)
    Similarity.releaseIndexes()
  }

  test("ivfPqAdd: re-encoding the build corpus reproduces the index's own code rows") {
    import spark.implicits._
    val (cents, books, codes) = Similarity.ivfPqIndex(tables.embeddings)
    // The add path is the same pure encoder the build ran — appending
    // the build corpus itself must reproduce its code rows bit-for-bit
    // (column order differs by construction; compare as maps).
    val added = Similarity.ivfPqAdd(cents, books, tables.embeddings)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        r.getLong(r.fieldIndex("vec_id")) ->
          (Seq("c0", "c1", "c2", "c3", "list_id", "rnsq")
            .map(c => r.getLong(r.fieldIndex(c))))
      }.toMap
    assert(keyed(added) == keyed(codes) && added.count() > 0)
    Similarity.releaseIndexes()
  }
}
