package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  test("driver contract: entry() returns rows and every query has a binding") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q01 groups by the 4 (returnflag, linestatus) combos present") {
    val rows = run("q01_pricing_summary").collect()
    assert(rows.length >= 3 && rows.length <= 6)
    val qty = rows.map(r => r.getLong(r.fieldIndex("sum_qty"))).sum
    val total = tables.lineitem.agg(sum(col("l_quantity"))).head.getDouble(0)
    assert(qty.toDouble == total)
  }

  test("q03 returns k rows in strict revenue-desc order") {
    val rows = run("q03_top_revenue_orders").collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getDouble(1))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q07 caps at 3 per customer") {
    import spark.implicits._
    val over = run("q07_top_orders_per_customer")
      .groupBy($"o_custkey").count().filter($"count" > 3).count()
    assert(over == 0)
  }

  test("semi + anti partition orders' customers") {
    import spark.implicits._
    val withO = tables.customer.join(tables.orders,
      $"c_custkey" === $"o_custkey", "left_semi").count()
    val withoutO = tables.customer.join(tables.orders,
      $"c_custkey" === $"o_custkey", "left_anti").count()
    assert(withO + withoutO == tables.customer.count())
  }
}

class TextDedupSpec extends SparkSpec {
  import operators.{Dedup, TextAnalysis}

  test("fingerprints are 32-hex and unique per distinct content") {
    val fps = run("q23_fingerprints").collect()
    assert(fps.forall(_.getString(1).matches("[0-9a-f]{32}")))
  }

  test("boilerplate ratio: bounds, flag consistency, and a planted dup saturates") {
    import spark.implicits._
    val rows = run("q76_boilerplate").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val n = r.getLong(1); val shared = r.getLong(2); val ratio = r.getDouble(3)
      shared >= 0 && shared <= n &&
        ratio == shared.toDouble / n &&
        r.getBoolean(4) == (ratio > 0.5)
    })
    // A byte-identical pair shares every shingle: both copies must read
    // as 100% boilerplate.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
    val out = Dedup.boilerplateRatio(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0 && out(2L) == 1.0 && out(3L) == 0.0)
  }

  test("shared spans: planted block counted per occurrence, within-doc repeats excluded") {
    import spark.implicits._
    val block = (1 to 8).map(i => s"lic$i").mkString(" ")
    def filler(id: Int, n: Int) = (0 until n).map(j => s"u${id}_$j").mkString(" ")
    val own = (1 to 8).map(i => s"own$i").mkString(" ")
    val docs = Seq(
      (1L, block + " " + filler(1, 8)),                    // block once
      (2L, block + " " + filler(2, 8) + " " + block),      // block twice
      (3L, filler(3, 20)),                                 // clean
      (4L, own + " " + filler(4, 8) + " " + own)           // self-repeat only
    ).toDF("doc_id", "text")
    val got = Dedup.sharedSpans(docs, 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // The only cross-doc 8-token window is the block itself: doc 2 carries
    // two occurrences of one distinct span; doc 3 is clean; doc 4's
    // internal repeat spans one distinct doc and must NOT count.
    assert(got == Map(1L -> ((1L, 1L)), 2L -> ((2L, 1L))))
    // Occurrence attribution is partitioning-invariant.
    val again = Dedup.sharedSpans(docs.repartition(5), 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == got)
    Dedup.releaseIndexes()
  }

  test("containment finds a quote inside a larger page that jaccard misses") {
    import spark.implicits._
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val page = quote + " " + (1 to 60).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, quote),                                  // contained verbatim
      (2L, page),                                   // the container
      (3L, (1 to 30).map(i => s"z$i").mkString(" "))// unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.containmentDups(docs, 0.8, maxDf = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // Only the quote→page direction clears 0.8: every quote shingle is in
    // the page (containment 1.0), while page→quote is 10/70 and the
    // symmetric jaccard 10/70 would never flag this pair at any useful
    // threshold.
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
    val again = Dedup.containmentDups(docs.repartition(5), 0.8,
      maxDf = Long.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(again.toSeq == got.toSeq)
    Dedup.releaseIndexes()
  }

  test("incremental near-dup equals the full run restricted to the batch") {
    import spark.implicits._
    val docs = tables.documents
    val cut = 250L
    val full = Dedup.lshNearDups(docs, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter(_._2 >= cut)
    // State round-trips through parquet — the persisted-state contract,
    // not just an in-session DataFrame handoff.
    val dir = java.nio.file.Files.createTempDirectory("lshstate").toFile
    val (sb, ss) = Dedup.lshDedupState(docs.filter($"doc_id" < cut))
    sb.write.parquet(s"$dir/bands"); ss.write.parquet(s"$dir/sets")
    val got = Dedup.incrementalNearDups(
        spark.read.parquet(s"$dir/bands"), spark.read.parquet(s"$dir/sets"),
        docs.filter($"doc_id" >= cut), 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
    // The scenario is non-trivial at this SF: both old–new and new–new
    // candidate paths must have fired.
    assert(expected.exists(p => p._1 < cut), "no cross-generation pair")
    assert(expected.exists(p => p._1 >= cut), "no within-batch pair")
  }

  test("quality score lies in [0,1] and accept matches threshold") {
    val rows = run("q22_quality_score").collect()
    assert(rows.forall { r =>
      val q = r.getDouble(r.fieldIndex("quality"))
      q >= 0.0 && q <= 1.0 &&
        r.getBoolean(r.fieldIndex("accept")) == (q >= 0.75)
    })
  }

  test("LM familiarity: common-bigram docs outrank rare-bigram docs exactly") {
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog"
    val docs = ((1 to 10).map(i => (i.toLong, common)) :+
      (99L, "zxq wvu tsr qpo nml")).toDF("doc_id", "text")
    val got = TextAnalysis.lmFamiliarity(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // Every bigram of the repeated sentence occurs in all 10 copies:
    // cnt = 10, floor(log2 10) = 3 per occurrence, so familiarity is
    // exactly 3.0; the gibberish doc's bigrams are singletons → 0.0.
    assert(got(1L) == ((8L, 24L, 3.0)))
    assert(got(99L) == ((4L, 0L, 0.0)))
    // familiarity is exactly the integer score over the integer count.
    assert(got.values.forall { case (n, s, f) => f == s.toDouble / n })
  }

  test("vocab OOV: the frequency cut is exact and ties break by token") {
    import spark.implicits._
    // "b" and "c" tie at 2 occurrences for the last vocab slot (V=2 with
    // "a" at 3): ascending-token tiebreak keeps "b", so "c" is OOV.
    val docs = Seq(
      (1L, "a a b"), (2L, "a b c"), (3L, "c x y")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabOov(docs, vocabSize = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((3L, 0L, 0.0)))
    assert(got(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(got(3L) == ((3L, 3L, 1.0)))
    // Partitioning must not move the cut: the vocab is a total order.
    val again = TextAnalysis.vocabOov(docs.repartition(7), vocabSize = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == got.map { case (k, v) => k -> v._2 })
  }

  test("DSIR selection prefers docs that look like the target domain") {
    import spark.implicits._
    // Target domain (src0) speaks "alpha beta"; the wider corpus speaks
    // "gamma delta". A src1 doc written in target language must outscore
    // a src1 doc written in corpus language and win the k=2 cut.
    val docs = Seq(
      (1L, "alpha beta alpha beta", "src0"),
      (2L, "alpha beta alpha beta", "src0"),
      (3L, "alpha beta alpha beta", "src1"),
      (4L, "gamma delta gamma delta", "src1"),
      (5L, "gamma delta gamma delta", "src1"),
      (6L, "gamma delta gamma delta", "src1")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.dsirSelect(docs, "src0", buckets = 256, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(4)))).toMap
    assert(got.size == 6)
    // Target-language docs (1,2,3) all share the same positive-ish score
    // and beat the corpus-language docs; k=3 selects exactly them.
    assert(Seq(1L, 2L, 3L).forall(got(_)._2))
    assert(Seq(4L, 5L, 6L).forall(!got(_)._2))
    assert(got(3L)._1 > got(4L)._1)
    val again = TextAnalysis.dsirSelect(docs.repartition(5), "src0",
      buckets = 256, k = 3).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(again == got.map { case (i, v) => i -> v._2 })
  }

  test("exact jaccard pairs are ordered, thresholded, and symmetric-free") {
    val rows = run("q26_neardup_jaccard").collect()
    assert(rows.nonEmpty, "testdata contains planted near-dups")
    assert(rows.forall { r =>
      r.getLong(0) < r.getLong(1) && r.getDouble(2) >= 0.6 && r.getDouble(2) <= 1.0
    })
  }

  test("LSH near-dup equals exact jaccard at the same threshold (j>=0.9)") {
    val exact = Dedup.jaccardNearDups(tables.documents, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.lshNearDups(tables.documents, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("simhash signatures fit in 16 bits") {
    assert(run("q28_simhash").collect()
      .forall(r => { val s = r.getLong(1); s >= 0 && s < 65536 }))
  }

  test("simhash serve: ordered pairs agree with the self-join, parquet state round-trips") {
    import spark.implicits._
    import graft.operators.Dedup
    val docs = tables.documents
    val state = Dedup.simhashes(docs)
    val batch = docs.filter($"doc_id" < 20)
    val served = Dedup.simhashNearDupsFromState(state, batch, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // The self-join's unordered pairs, restricted to batch-involving ones
    // and re-ordered batch-first, must equal the served set exactly —
    // serve is the same pigeonhole search with a different blocking side.
    val self = Dedup.simhashNearPairs(docs, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = self.flatMap { case (a, b, h) =>
      Seq((a, b, h), (b, a, h))
    }.filter(_._1 < 20).toSet
    assert(served == expected && served.nonEmpty)
    // The state is plain parquet — the persisted-index serving contract.
    val dir = java.nio.file.Files.createTempDirectory("simstate").toString
    state.write.parquet(s"$dir/sigs")
    val roundTrip = Dedup.simhashNearDupsFromState(
      spark.read.parquet(s"$dir/sigs"), batch, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(roundTrip == served)
  }

  test("wide simhash: 60-bit pairs ordered and thresholded, serve equals self-join") {
    import spark.implicits._
    import graft.operators.Dedup
    val docs = tables.documents
    val sigs = Dedup.simhashes(docs, 60)
    assert(sigs.collect().forall { r =>
      val s = r.getLong(1); s >= 0 && s < (1L << 60)
    })
    // The wide space must be at least as discriminative as the 16-bit
    // one on the same corpus (it can only split 16-bit collisions).
    val n16 = Dedup.simhashes(docs).select("simhash").distinct().count()
    val n60 = sigs.select("simhash").distinct().count()
    assert(n60 >= n16)
    val pairs = Dedup.hammingNearPairs(sigs, "doc_id", "simhash", 60, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty, "planted near-dups within hamming 5 at 60 bits")
    assert(pairs.forall { case (a, b, h) => a < b && h <= 5 })
    // Serve against the full-state signatures must equal the self-join
    // restricted to batch-involving pairs, re-ordered batch-first —
    // the same invariant as the 16-bit serve test, at the wide width.
    val batch = docs.filter($"doc_id" < 200)
    val served = Dedup.simhashNearDupsFromState(sigs, batch, 5, bits = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expected = pairs.flatMap { case (a, b, h) =>
      Seq((a, b, h), (b, a, h))
    }.filter(_._1 < 200).toSet
    assert(served == expected)
  }

  test("MIH hamming join: every chunk geometry equals brute force") {
    import spark.implicits._
    import graft.operators.Dedup
    // Synthetic 16-bit signatures with planted near pairs: id 3k+1 is
    // id 3k with one bit flipped, 3k+2 with five flipped — bits 0, 4,
    // 8, 12, 15, all inside the 16-bit width, outside maxDist=3.
    // (An earlier form wrote `s ^ 0x1111L + 16L`, which precedence
    // parses as `s ^ 0x1121L` — four flips, not five; brute force was
    // the oracle either way, but plant and intent now agree.)
    val base = (0 until 60).map(i =>
      (i * 3L, (graft.functions.Fp.detHash32Local("mih", i.toString) & 0xFFFFL)))
    val sigs = base.flatMap { case (id, s) =>
      Seq((id, s), (id + 1, s ^ 2L), (id + 2, s ^ 0x9111L))
    }.toDF("_id", "_sig")
    val brute = sigs.as("x").crossJoin(sigs.as("y"))
      .filter(col("x._id") < col("y._id"))
      .select(col("x._id"), col("y._id"),
        bit_count(col("x._sig").bitwiseXOR(col("y._sig"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 <= 3).toSet
    assert(brute.nonEmpty)
    // Generalized pigeonhole holds at EVERY chunk count — r=0 (the old
    // chunks=maxDist+1 split), the wide-chunk MIH geometries, and the
    // degenerate single-chunk full enumeration all return the same set.
    for (c <- 1 to 4) {
      val got = Dedup.hammingNearPairsWithChunks(sigs, 16, 3, c)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == brute, s"chunk geometry c=$c diverged from brute force")
    }
    // The public entry point (auto geometry) matches too.
    val auto = Dedup.hammingNearPairs(sigs, "_id", "_sig", 16, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(auto == brute)
  }

  test("MIH candidate count: aggregated form equals the materialized join") {
    import spark.implicits._
    import graft.operators.Dedup
    // hammingCandidateCount derives (M - chunks*n) / 2 from two
    // (c, v)-grouped counts instead of materializing the join (the 50M
    // probe's disk fix); the identity must hold at every geometry,
    // including ones where a pair matches in several chunks (counted
    // once per matching chunk by both forms).
    val sigs = (0 until 150).map { i =>
      val s = graft.functions.Fp.detHash32Local("mihcand", i.toString) & 0xFFFFL
      (i.toLong, if (i % 3 == 1) s ^ 1L else s)
    }.toDF("_id", "_sig")
    for (c <- 1 to 4) {
      val joined = Dedup.chunkSigs(sigs, 16, 3, c).as("x")
        .join(Dedup.chunkProbes(sigs, 16, 3, c).as("y"),
          col("x.c") === col("y.c") && col("x.v") === col("y.v") &&
            col("x._id") < col("y._id"))
        .count()
      val agg = Dedup.hammingCandidateCount(sigs, 16, 3, c)
      assert(agg == joined, s"candidate-count identity broke at c=$c")
    }
  }

  test("MIH wide geometry on the real corpus equals the r=0 split") {
    import graft.operators.Dedup
    // The q101 shape: 60-bit signatures, maxDist 5. The corpus-size-
    // driven geometry (wider chunks, radius-1 probe balls) must return
    // exactly the rows the legacy chunks=maxDist+1 exact-match split
    // returns — the oracle-facing proof that the MIH rewrite changed
    // the plan, not the answer.
    val sigs = Dedup.simhashes(tables.documents, 60)
      .select(col("doc_id").as("_id"), col("simhash").as("_sig"))
    val legacy = Dedup.hammingNearPairsWithChunks(sigs, 60, 5, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // The geometries the cost model picks at corpus scale (3×20-bit at
    // n≳10k, 2×30-bit in between) must agree with the r=0 split on the
    // same signatures; at the 500-doc verify corpus the model itself
    // still picks r=0 (enumeration would cost more than it saves), so
    // the wide legs are forced here and exercised live at bench scale.
    assert(Dedup.mihChunks(60, 5, 500) == 6)
    assert(Dedup.mihChunks(60, 5, 60000) == 3)
    for (c <- Seq(2, 3)) {
      val mih = Dedup.hammingNearPairsWithChunks(sigs, 60, 5, c)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(mih == legacy && mih.nonEmpty, s"wide geometry c=$c diverged")
    }
  }

  test("nearDupsAdaptive routes by corpus size; bands track the threshold") {
    import graft.operators.Dedup
    val docs = tables.documents
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Below the boundary (every test corpus is): the dispatcher IS the
    // exact prefix-filtered join.
    assert(pairs(Dedup.nearDupsAdaptive(docs, 0.7)) ==
      pairs(Dedup.jaccardNearDups(docs, 0.7, Dedup.defaultMaxDf)))
    // Forced above the boundary: the dispatcher becomes the LSH route
    // at the threshold-derived band count (16 at 0.9 — the q27
    // geometry, so the plans coincide exactly).
    assert(pairs(Dedup.nearDupsAdaptive(docs, 0.9, exactMaxDocs = 1L)) ==
      pairs(Dedup.lshNearDups(docs, 0.9)))
    // Band sizing: floored at the measured q27 default, growing as the
    // threshold falls (miss (1-j^4)^b <= 1e-4), capped at 256.
    assert(Dedup.minhashBandsFor(0.9) == 16)
    assert(Dedup.minhashBandsFor(0.7) == 34)
    assert(Dedup.minhashBandsFor(0.6) == 67)
    assert(Dedup.minhashBandsFor(0.3) == 256)
    val bs = Seq(0.95, 0.9, 0.8, 0.7, 0.6, 0.5).map(Dedup.minhashBandsFor)
    assert(bs == bs.sorted, s"bands must grow as the threshold falls: $bs")
  }

  test("MIH join strategy honors the session broadcast budget") {
    import spark.implicits._
    import graft.operators.Dedup
    val sigs = (0 until 200).map(i =>
      (i.toLong, graft.functions.Fp.detHash32Local("mihbb", i.toString) & 0xFFFFL))
      .toDF("_id", "_sig")
    def strategies(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // Default budget (autoBroadcastJoinThreshold 10 MB ≈ 218k rows):
    // a 200-row index side broadcasts.
    val bplan = Dedup.hammingNearPairs(sigs, "_id", "_sig", 16, 3)
    assert(strategies(bplan).contains("BroadcastHashJoin"),
      "small index side must broadcast under the default budget")
    val bres = pairs(bplan)
    // Budget 0 (the conf a broadcast-disabled cluster declares): the
    // same join flips to the shuffled-hash regime — and returns the
    // identical pair set. graft.mih.broadcastBytes overrides WITHOUT
    // touching other joins' broadcast policy.
    spark.conf.set("spark.graft.mih.broadcastBytes", "0")
    try {
      assert(Dedup.mihBroadcastRows(spark) == 0L)
      val splan = Dedup.hammingNearPairs(sigs, "_id", "_sig", 16, 3)
      val s = strategies(splan)
      assert(s.contains("ShuffledHashJoin") && !s.contains("BroadcastHashJoin"),
        "zero budget must force the shuffled-hash regime")
      assert(pairs(splan) == bres && bres.nonEmpty)
      // The serve-side join honors the same budget on its batch fan-out.
      val servePlan = Dedup.hammingNearPairsAgainst(
        sigs.select($"_id".as("doc_id"), $"_sig".as("simhash")),
        sigs.filter($"_id" < 20).select($"_id".as("doc_id"),
          $"_sig".as("simhash")), "doc_id", "simhash", 16, 3)
      assert(strategies(servePlan).contains("ShuffledHashJoin"))
    } finally spark.conf.unset("spark.graft.mih.broadcastBytes")
    // Disabled auto-broadcast (-1) reads as a zero budget, not a crash.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try assert(Dedup.mihBroadcastRows(spark) == 0L)
    finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("serve-side batch caches are scoped and evictable per micro-batch") {
    import spark.implicits._
    import graft.operators.Dedup
    Dedup.releaseBatchIndexes()
    val state = Dedup.simhashes(tables.documents, 60)
    val before = Dedup.batchIndexCount
    // Two served batches: each signing builds batch-lifetime frames that
    // land in the batch registry, NOT the session registry.
    val d1 = Dedup.simhashNearDupsFromState(state,
      tables.documents.filter($"doc_id" < 50), 5, bits = 60).count()
    val d2 = Dedup.simhashNearDupsFromState(state,
      tables.documents.filter($"doc_id" >= 50 && $"doc_id" < 100), 5,
      bits = 60).count()
    assert(Dedup.batchIndexCount > before,
      "batch frames must register in the batch scope")
    // The per-micro-batch eviction the ingest loop runs: batch frames
    // drain; corpus indexes are untouched and the serve still answers.
    Dedup.releaseBatchIndexes()
    assert(Dedup.batchIndexCount == 0)
    val d3 = Dedup.simhashNearDupsFromState(state,
      tables.documents.filter($"doc_id" < 50), 5, bits = 60).count()
    assert(d3 == d1 && d1 + d2 >= 0)
    Dedup.releaseBatchIndexes()
  }

  test("MinhashBands equals the aggregate minhash formulation bit-for-bit") {
    // The persisted-state contract: LSH state written by the pre-r10
    // 64-aggregate formulation must interoperate with signatures computed
    // by the native expression. Rebuild the old formulation inline and
    // assert identical (doc_id, band, bh) rows over the real corpus.
    import spark.implicits._
    val sh = Dedup.shingleIndex(tables.documents)
    val (bands, rows) = (16, 4)
    val mins = (0 until bands * rows).map(p =>
      min(xxhash64(lit(p), $"s64")).as(s"m$p"))
    val agg = sh.groupBy($"doc_id").agg(mins.head, mins.tail: _*)
    val bandStructs = (0 until bands).map { b =>
      val cols = (0 until rows).map(r => col(s"m${b * rows + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val legacy = agg
      .select($"doc_id", explode(array(bandStructs: _*)).as("bb"))
      .select($"doc_id", $"bb.band", $"bb.bh")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val native = sh.groupBy($"doc_id")
      .agg(sort_array(collect_list($"s64")).as("ss"))
      .select($"doc_id", posexplode(
        graft.functions.VecExprs.minhashBands($"ss", bands, rows))
        .as(Seq("band", "bh")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(native == legacy)
    assert(native.nonEmpty)
  }
}

class SamplingSpec extends SparkSpec {
  import operators.Sampling

  test("weighted choice is deterministic across runs") {
    val a = run("q34_sampled_record").collect().toSeq
    val b = run("q34_sampled_record").collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }

  test("weighted choice frequencies roughly track weights") {
    import spark.implicits._
    val n = tables.documents.count().toDouble
    val freq = run("q34_sampled_record").groupBy($"garment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1) / n).toMap
    Sampling.garments.foreach { case (item, w) =>
      val f = freq.getOrElse(item, 0.0)
      assert(math.abs(f - w) < 0.08, s"$item: got $f want ~$w")
    }
  }

  test("bernoulli top-up guarantees at least 4 categories per doc") {
    import spark.implicits._
    val perDoc = run("q36_bernoulli_topup").groupBy($"doc_id").count()
    assert(perDoc.filter($"count" < 4).count() == 0)
  }

  test("hierarchical items belong to their sampled category") {
    val valid = Sampling.hierarchy
      .map { case (c, _, items) => c -> items.map(_._1).toSet }.toMap
    assert(run("q35_hierarchical_sample").collect()
      .forall(r => valid(r.getString(1)).contains(r.getString(2))))
  }

  test("doc packing: every doc packed once, packs bounded, repartition-invariant") {
    import spark.implicits._
    val budget = 2000L
    val docs = tables.documents
    val packed = Sampling.packDocuments(docs, budget, nBuckets = 8)
    val rows = packed.join(docs.select($"doc_id", $"n_chars"), "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(r.fieldIndex("bucket")),
        r.getLong(r.fieldIndex("pack")), r.getLong(r.fieldIndex("n_chars"))))
    // One assignment per document.
    assert(rows.length == docs.count() && rows.map(_._1).distinct.length == rows.length)
    val byPack = rows.groupBy(r => (r._2, r._3))
    assert(byPack.size > 8, "budget should force multiple packs per bucket")
    byPack.foreach { case ((b, p), members) =>
      // Chunking bound: a pack's payload is < budget + its largest member
      // (the cum-div rule admits at most one overflowing document).
      val total = members.map(_._4).sum
      assert(total < budget + members.map(_._4).max,
        s"pack ($b,$p) holds $total chars")
    }
    // Pack ids are contiguous 0..max within each bucket.
    byPack.keys.groupBy(_._1).foreach { case (_, ps) =>
      val ids = ps.map(_._2).toSeq.sorted
      assert(ids == (0L to ids.max))
    }
    // Doctrine: assignment is a pure function of the data, not of input
    // partitioning.
    val again = Sampling.packDocuments(docs.repartition(7), budget, 8)
      .collect().map(_.toSeq).toSet
    assert(again == packed.collect().map(_.toSeq).toSet)
  }

  test("temperature mix: quotas track sqrt-mass, fill is exact and repartition-invariant") {
    import spark.implicits._
    val docs = tables.documents
    val n = docs.count()
    val budget = n / 2
    val taken = Sampling.temperatureSample(docs, budget)
    val rows = taken.collect()
    // Budget respected; floor loses < 1 doc per source.
    val nSources = docs.select($"source").distinct().count()
    assert(rows.length <= budget && rows.length >= budget - nSources)
    // No document sampled twice; ranks are a contiguous 1..quota prefix.
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val rks = rs.map(_.getLong(2)).sorted
      assert(rks.toSeq == (1L to rks.last))
    }
    // α = 0.5 flattens the mixture: realized per-source takes must be
    // monotone in source char mass (the quota is sqrt-mass-proportional,
    // and every quota binds at budget = n/2 in this corpus).
    val mass = docs.groupBy($"source").agg(sum($"n_chars").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val takes = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val bySrc = mass.toSeq.sortBy(_._2).map { case (s, _) => takes.getOrElse(s, 0) }
    assert(bySrc.zip(bySrc.tail).forall { case (a, b) => a <= b })
    val again = Sampling.temperatureSample(docs.repartition(5), budget)
      .collect().map(_.toSeq).toSet
    assert(again == rows.map(_.toSeq).toSet)
  }
}

class ChunkingSpec extends SparkSpec {
  import operators.TextAnalysis

  test("chunking: counts, overlap, clamped tails, and lossless reconstruction") {
    import spark.implicits._
    val (win, stride) = (32, 24)
    val docs = tables.documents
    val chunks = TextAnalysis.chunkDocs(docs, win, stride).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val toks = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val t = toks(id)
      val byId = cs.sortBy(_._2)
      // ceil(n / stride) chunks, ids contiguous from 0.
      assert(byId.map(_._2).toSeq == (0L until ((t.length - 1) / stride + 1)))
      byId.foreach { case (_, i, text) =>
        // Chunk i is exactly tokens [i*stride, i*stride + win), clamped.
        val want = t.slice(i.toInt * stride, i.toInt * stride + win)
        assert(text == want.mkString(" "))
      }
      // Reconstruction: each chunk's first `stride` tokens, concatenated,
      // plus the last chunk's overhang, is the whole document — so no
      // token is lost and overlap is exactly win - stride.
      val rebuilt = byId.flatMap { case (_, i, text) =>
        val ts = text.split(" ", -1).toSeq
        if (i == byId.last._2) ts else ts.take(stride)
      }
      assert(rebuilt.toSeq == t)
    }
    // Multi-chunk docs exist at this SF (longest docs exceed one window).
    assert(chunks.groupBy(_._1).exists(_._2.length > 1))
  }

  test("array-form shingle index equals the exploded-distinct formulation") {
    import spark.implicits._
    import operators.Dedup
    // Edge corpus: repeated 3-grams (per-doc distinct must collapse
    // them), a 2-token doc and an empty doc (no shingles — NO row in
    // either form), and a plain doc. Plus the real sf corpus below.
    val edge = Seq((1L, "a b c a b c a b c"), (2L, "a b"), (3L, ""),
      (4L, "x y z w")).toDF("doc_id", "text")
    def oldForm(docs: org.apache.spark.sql.DataFrame) = docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks", posexplode($"toks").as(Seq("i", "w")))
      .filter($"i" <= size($"toks") - 3)
      .select($"doc_id", graft.functions.Fp.hash60(concat_ws(" ", $"w",
        element_at($"toks", $"i" + 2), element_at($"toks", $"i" + 3)))
        .as("s64"))
      .distinct()
    for (docs <- Seq(edge, tables.documents)) {
      val rows = Dedup.shingleIndex(docs)
      val old = oldForm(docs)
      assert(rows.except(old).isEmpty && old.except(rows).isEmpty)
      assert(rows.count() == old.count()) // both sides distinct
      // The cached array IS the sorted set the verify/signer consume —
      // must equal the collect_list form the pre-r18 builder cached.
      val sets = Dedup.lshDedupState(docs)._2.select($"doc_id", $"ss")
      val setsOld = old.groupBy($"doc_id")
        .agg(sort_array(collect_list($"s64")).as("ss"))
      assert(sets.except(setsOld).isEmpty && setsOld.except(sets).isEmpty)
    }
    Dedup.releaseIndexes()
  }

  test("plan-keyed memos see in-place overwrites (file-snapshot key)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("memoKey").toString
    val reg = new graft.CacheRegistry
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    assert(reg.collectOnce(spark.read.parquet(dir))
      .map(_.getString(1)).toSeq == Seq("a"))
    assert(reg.countOnce(spark.read.parquet(dir)) == 1L)
    // Overwrite IN PLACE: the re-read canonicalizes equal (rootPaths-
    // based file-index equality), so a plan-only memo key would serve
    // the stale row — the snapshot component must miss and recompute.
    Seq((1L, "b"), (2L, "b")).toDF("id", "v").write.mode("overwrite")
      .parquet(dir)
    assert(reg.collectOnce(spark.read.parquet(dir))
      .map(_.getString(1)).toSet == Set("b"))
    assert(reg.countOnce(spark.read.parquet(dir)) == 2L)
  }
}

class SessionsSimilaritySpec extends SparkSpec {
  test("sessions have consistent bounds and positive event counts") {
    val rows = run("q29_sessionize").collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      r.getLong(r.fieldIndex("n_events")) > 0 &&
        r.getLong(r.fieldIndex("end_us")) >= r.getLong(r.fieldIndex("start_us"))
    })
  }

  test("session count equals gap-boundary count per user") {
    import spark.implicits._
    val sessions = run("q29_sessionize")
    val perUser = sessions.groupBy($"user_id")
      .agg(max($"session_id").as("m"), count(lit(1)).as("c"))
    assert(perUser.filter($"m" =!= $"c").count() == 0)
  }

  test("cosine top-k ranks are dense 1..k and cos within [-1,1]") {
    import spark.implicits._
    val rows = run("q37_cosine_topk").collect()
    assert(rows.length == 25)
    assert(rows.forall { r =>
      val c = r.getDouble(r.fieldIndex("cos")); c >= -1.0001 && c <= 1.0001
    })
    val ranks = rows.groupBy(_.getLong(0)).values
      .map(_.map(r => r.getLong(r.fieldIndex("rk"))).sorted.toSeq)
    assert(ranks.forall(_ == Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("near-dup clusters are consistent with the pair graph") {
    import spark.implicits._
    val docs = tables.documents
    val pairs = operators.Dedup.jaccardNearDups(docs, 0.6)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = operators.Dedup.nearDupClusters(docs, 0.6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    // Every doc labeled; paired docs share a cluster; label is the min id
    // of its members; exactly one keeper per cluster; sizes consistent.
    assert(clusters.size == docs.count())
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split")
    }
    val byCluster = clusters.groupBy(_._2._1)
    byCluster.foreach { case (label, members) =>
      assert(label == members.keys.min)
      assert(members.values.count(_._3) == 1)
      assert(members.values.forall(_._2 == members.size))
    }
  }

  test("leakage-safe split: near-dup pairs never straddle splits; singletons match q62") {
    import spark.implicits._
    val docs = tables.documents
    val split = operators.Dedup.leakageSafeSplit(docs, 0.6).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(split.size == docs.count())
    // The leakage guarantee: every near-dup pair lands in ONE split.
    operators.Dedup.jaccardNearDups(docs, 0.6)
      .select($"doc_a", $"doc_b").collect()
      .foreach { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        assert(split(a)._2 == split(b)._2, s"pair ($a,$b) straddles splits")
      }
    // Clusters do get coalesced: at least one doc's cluster-keyed split
    // exists, and the split is a function of the cluster label.
    split.values.groupBy(_._1).foreach { case (_, members) =>
      assert(members.map(_._2).toSet.size == 1)
    }
    // A singleton's cluster label is its own doc_id, so it gets exactly
    // the split the per-document operator (q62's detUniform("split", ·))
    // assigns.
    val singletons = split.filter { case (id, (label, _)) => id == label }
    assert(singletons.nonEmpty)
    val perDoc = docs.select($"doc_id",
        when(graft.functions.Fp.detUniform("split", $"doc_id") < 0.8, "train")
          .when(graft.functions.Fp.detUniform("split", $"doc_id") < 0.9, "val")
          .otherwise("test").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Only true singletons (label == own id AND cluster of size 1) must
    // match; a min-member of a larger cluster also has label == id but
    // its split is still keyed on the same value, so equality holds for
    // all label==id docs by construction.
    singletons.foreach { case (id, (_, s)) =>
      assert(perDoc(id) == s, s"singleton $id split drifted from q62's")
    }
  }

  test("distributed cluster fixpoint matches the union-find fast path") {
    // Force the distributed min-label propagation branch (the 100 TB
    // path, otherwise unreachable at test scale) and require identical
    // output to the driver-side union-find.
    val docs = tables.documents
    val fast = operators.Dedup.nearDupClusters(docs, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val dist = operators.Dedup
      .nearDupClusters(docs, 0.6, unionFindMaxEdges = -1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(fast == dist)
    assert(fast.nonEmpty)
  }

  test("LSH top-k cos values match brute-force for the same (qid,nid)") {
    import spark.implicits._
    val brute = operators.Similarity.cosineTopK(tables.embeddings, 20, 500)
      .select($"qid", $"nid", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = run("q38_cosine_topk_lsh").collect()
    assert(lsh.nonEmpty)
    assert(lsh.forall { r =>
      brute.get((r.getLong(0), r.getLong(1)))
        .forall(_ == r.getDouble(r.fieldIndex("cos")))
    })
  }

  test("PII scan: counts, ordered redaction, multi-class and clean rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at jo.doe+x@mail.example.org or 555-123-4567 thanks"),
      (2L, "server 10.0.0.1 and 192.168.001.255 rebooted"),
      // Email-shaped with an IP host: NOT an email (the pattern demands
      // an alphabetic TLD), but the embedded IP still gets scrubbed.
      (3L, "admin@10.1.2.3 logged in"),
      (4L, "no pii here, just 12.5 percent and v1.2.3 tags"),
      (5L, "")).toDF("doc_id", "text")
    val out = operators.TextAnalysis.piiScan(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def counts(id: Long) =
      (out(id).getLong(1), out(id).getLong(2), out(id).getLong(3))
    assert(counts(1L) == (1L, 0L, 1L))
    assert(out(1L).getString(4) == "reach me at <EMAIL> or <PHONE> thanks")
    assert(counts(2L) == (0L, 2L, 0L))
    assert(out(2L).getString(4) == "server <IP> and <IP> rebooted")
    assert(counts(3L) == (0L, 1L, 0L))
    assert(out(3L).getString(4) == "admin@<IP> logged in")
    // Version tags and decimals must not trip the IPv4/phone patterns,
    // and a clean row reports has_pii = false with untouched text.
    assert(counts(4L) == (0L, 0L, 0L))
    assert(!out(4L).getBoolean(5) && out(4L).getString(4) == docs
      .filter($"doc_id" === 4L).head.getString(1))
    assert(counts(5L) == (0L, 0L, 0L))
    assert(out(1L).getBoolean(5) && out(3L).getBoolean(5))
    // Null text (tolerant loaders admit it) must census as zero-and-clean,
    // never null/-1 counts.
    val nullRow = operators.TextAnalysis.piiScan(
      Seq((9L, Option.empty[String])).toDF("doc_id", "text")).collect().head
    assert((nullRow.getLong(1), nullRow.getLong(2), nullRow.getLong(3)) ==
      ((0L, 0L, 0L)))
    assert(!nullRow.getBoolean(5) && nullRow.getString(4) == "")
  }
}
