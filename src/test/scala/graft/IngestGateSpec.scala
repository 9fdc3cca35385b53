package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IngestGate, Similarity}

/** The composed ingest gate (r11 verdict task 4): exact fingerprint →
  * SimHash → embedding serve halves chained over shared state as a
  * short-circuit cascade, with per-stage trim accounting.
  */
class IngestGateSpec extends SparkSpec {

  // Deterministic synthetic corpus: 40 state docs with distinct wordy
  // texts and hash-spread embeddings keyed by the same ids.
  private def stateText(i: Int): String =
    s"the quick brown fox number $i jumps over the lazy dog while " +
      s"carrying basket ${i * 7 % 13} of ripe apples pears and plums " +
      s"through meadow ${i * 11 % 17} beyond the old stone bridge"

  private def hashComp(id: Int, j: Int): Float =
    (scala.util.hashing.MurmurHash3.productHash((id, j)) % 1000) / 1000f

  private def stateEmb(i: Int): Seq[Float] =
    Array.tabulate(64)(j => hashComp(i, j)).toSeq

  test("gate: three-tier cascade trims at the earliest stage, accounts per stage, passes novelty") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    val state = IngestGate.buildState(docs, embs, nlist = 4)

    // The batch:
    //  d100 — verbatim copy of doc 5 (ALSO SimHash- and embedding-near
    //         by construction: must be attributed to 'exact' only).
    //  d101 — doc 7 with one word changed: fingerprint differs, SimHash
    //         stays within maxDist (near-verbatim edit).
    //  d102 — novel text but embedding ≈ doc 9's (semantic duplicate).
    //  d103 — novel text, novel embedding: passes all three tiers.
    val batchDocs = Seq(
      (100L, stateText(5)),
      (101L, stateText(7).replace("ripe", "rotten")),
      (102L, "completely different prose about rainfall statistics " +
        "over coastal towns measured during nineteen eighty four"),
      (103L, "unrelated treatise on the migration patterns of arctic " +
        "terns across hemispheres every single year")
    ).toDF("doc_id", "text")
    def near(base: Seq[Float]): Seq[Float] = base.map(x => x + 0.001f)
    val batchEmb = Seq(
      (100L, stateEmb(5)), (101L, stateEmb(7)),
      (102L, near(stateEmb(9))), (103L, stateEmb(103))
    ).toDF("vec_id", "embedding")

    // Width-derived defaults: the 60-bit state resolves maxDist=11 and
    // minShingles=11 on its own — no per-call width arguments.
    val out = IngestGate.gate(state, batchDocs, batchEmb).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out.size == 4)
    assert(out(100L) == (("exact", 5L)), s"d100: ${out(100L)}")
    assert(out(101L) == (("simhash", 7L)), s"d101: ${out(101L)}")
    assert(out(102L) == (("embedding", 9L)), s"d102: ${out(102L)}")
    assert(out(103L) == (("pass", -1L)), s"d103: ${out(103L)}")

    // Per-stage trim accounting — the report a curation flow logs.
    val acct = IngestGate.gate(state, batchDocs, batchEmb)
      .groupBy($"stage").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(acct == Map("exact" -> 1L, "simhash" -> 1L,
      "embedding" -> 1L, "pass" -> 1L))

    // Short-circuit is real, not cosmetic: run the LATER stages alone
    // on the full batch — d100 would be claimed by both (it is a
    // verbatim copy, so SimHash distance 0 and cosine 1), yet the
    // cascade reported it at 'exact' only.
    val simAll = Dedup.simhashNearDupsFromState(state.sims, batchDocs,
        11, bits = 60)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(simAll.contains(100L))
    val embAll = Similarity.cosineNearDupsFromIndex(state.cents,
        state.assigned, batchEmb, 0.9)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(embAll.contains(100L))

    // Deterministic across runs and partitionings.
    val again = IngestGate.gate(state,
        batchDocs.repartition(3), batchEmb.repartition(5)).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(again == out)
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }

  test("gate state round-trips through parquet and interoperates with the per-family serves") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    val built = IngestGate.buildState(docs, embs, nlist = 4)
    val dir = java.nio.file.Files.createTempDirectory("gate").toString
    built.fps.write.parquet(s"$dir/fps")
    built.sims.write.parquet(s"$dir/sims")
    built.cents.write.parquet(s"$dir/cents")
    built.assigned.write.parquet(s"$dir/assigned")
    val loaded = IngestGate.GateState(
      spark.read.parquet(s"$dir/fps"), spark.read.parquet(s"$dir/sims"),
      spark.read.parquet(s"$dir/cents"),
      spark.read.parquet(s"$dir/assigned"))
    val batchDocs = Seq((100L, stateText(5)),
      (101L, "novel text that matches nothing in the corpus at all"))
      .toDF("doc_id", "text")
    val batchEmb = Seq((100L, stateEmb(5)), (101L, stateEmb(101)))
      .toDF("vec_id", "embedding")
    val fromBuilt = IngestGate.gate(built, batchDocs, batchEmb)
      .collect().map(_.toSeq).toSet
    val fromLoaded = IngestGate.gate(loaded, batchDocs, batchEmb)
      .collect().map(_.toSeq).toSet
    assert(fromBuilt == fromLoaded && fromBuilt.nonEmpty)
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }

  test("admit closes the loop: a batch-2 dup of a batch-1 survivor is caught at its tier") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    val state0 = IngestGate.buildState(docs, embs, nlist = 4)

    // Batch 1: one novel survivor (d103) plus one exact dup (d100) that
    // must NOT be admitted.
    val novelText = "unrelated treatise on the migration patterns of " +
      "arctic terns across hemispheres every single year"
    val b1Docs = Seq((100L, stateText(5)), (103L, novelText))
      .toDF("doc_id", "text")
    val b1Emb = Seq((100L, stateEmb(5)), (103L, stateEmb(103)))
      .toDF("vec_id", "embedding")
    val d1 = IngestGate.gate(state0, b1Docs, b1Emb)
    val state1 = IngestGate.admit(state0, d1, b1Docs, b1Emb)

    // Durability: the admitted state round-trips through parquet, the
    // shape a checkpointed foreachBatch sink persists per batch.
    val dir = java.nio.file.Files.createTempDirectory("gateadmit").toString
    state1.fps.write.parquet(s"$dir/fps")
    state1.sims.write.parquet(s"$dir/sims")
    state1.cents.write.parquet(s"$dir/cents")
    state1.assigned.write.parquet(s"$dir/assigned")
    val state1L = IngestGate.GateState(
      spark.read.parquet(s"$dir/fps"), spark.read.parquet(s"$dir/sims"),
      spark.read.parquet(s"$dir/cents"),
      spark.read.parquet(s"$dir/assigned"))

    // Batch 2 dups target the BATCH-1 SURVIVOR, not the original corpus:
    //  d200 — verbatim d103 → exact tier, dup_of 103
    //  d201 — one-word edit of d103 → simhash tier, dup_of 103
    //  d202 — novel prose, embedding ≈ d103's → embedding tier, dup_of 103
    //  d203 — novel everything → pass
    def near(base: Seq[Float]): Seq[Float] = base.map(x => x + 0.001f)
    val b2Docs = Seq(
      (200L, novelText),
      (201L, novelText.replace("arctic", "antarctic")),
      (202L, "entirely new prose describing harvest festivals in " +
        "mountain villages with lanterns and drums"),
      (203L, "final novel document about tidal forces shaping river " +
        "deltas through the centuries")
    ).toDF("doc_id", "text")
    val b2Emb = Seq(
      (200L, stateEmb(103)), (201L, stateEmb(103)),
      (202L, near(stateEmb(103))), (203L, stateEmb(203))
    ).toDF("vec_id", "embedding")
    val out2 = IngestGate.gate(state1L, b2Docs, b2Emb).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out2(200L) == (("exact", 103L)), s"d200: ${out2(200L)}")
    assert(out2(201L) == (("simhash", 103L)), s"d201: ${out2(201L)}")
    assert(out2(202L) == (("embedding", 103L)), s"d202: ${out2(202L)}")
    assert(out2(203L) == (("pass", -1L)), s"d203: ${out2(203L)}")

    // WITHOUT admit the same batch sails through — the catches above
    // really come from the admitted survivor rows.
    val noAdmit = IngestGate.gate(state0, b2Docs, b2Emb).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(noAdmit.values.forall(_ == "pass"), s"no-admit: $noAdmit")

    // The trimmed d100 was NOT admitted: its fingerprint appears once
    // (doc 5's original), and centroids are byte-identical (admit never
    // retrains — drift is ivfAssignCost's job).
    assert(state1L.assigned.filter($"vec_id" === 100L).count() == 0)
    assert(state1L.cents.collect().map(_.toSeq).toSet ==
      state0.cents.collect().map(_.toSeq).toSet)
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }

  test("gate+admit runs under foreachBatch: consecutive micro-batches dedup against each other") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    var state = IngestGate.buildState(docs, embs, nlist = 4)
    val novelText = "unrelated treatise on the migration patterns of " +
      "arctic terns across hemispheres every single year"
    // File source with maxFilesPerTrigger=1 (the repo's deterministic
    // micro-batch pattern): batch 1 carries the novel d300, batch 2 its
    // verbatim copy d301 — only the ADMITTED batch-1 survivor can catch
    // it.
    val root = Files.createTempDirectory("gatestream").toString
    Files.createDirectories(Paths.get(s"$root/in"))
    Files.writeString(Paths.get(s"$root/in/b1.jsonl"),
      s"""{"doc_id":300,"text":"$novelText"}""")
    Files.writeString(Paths.get(s"$root/in/b2.jsonl"),
      s"""{"doc_id":301,"text":"$novelText"}""")
    // Embeddings arrive with the doc in a real pipeline; the handler
    // derives them from the id with the same deterministic hash here.
    val decisions = scala.collection.mutable.Map[Long, String]()
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", "1")
      .json(s"$root/in")
    val q = streaming.Streams.toForeachBatchSink(stream, s"$root/ckpt") {
      (batch, _) =>
        if (!batch.isEmpty) {
          val bd = batch.localCheckpoint()
          val be = bd.select($"doc_id").collect().map(_.getLong(0))
            .map(id => (id, stateEmb(id.toInt))).toSeq
            .toDF("vec_id", "embedding")
          val d = IngestGate.gate(state, bd, be).localCheckpoint()
          d.collect().foreach(r =>
            decisions(r.getLong(0)) = r.getString(1))
          // Real deployments write the admitted tables to parquet under
          // the sink's batch-id gate; in-memory state + localCheckpoint
          // keeps the micro-batch lineage from stacking (the flow
          // lesson) while preserving the same per-batch semantics.
          val adm = IngestGate.admit(state, d, bd, be)
          state = adm.copy(fps = adm.fps.localCheckpoint(),
            sims = adm.sims.localCheckpoint(),
            assigned = adm.assigned.localCheckpoint())
        }
    }
    q.awaitTermination()
    assert(decisions(300L) == "pass", s"batch1: $decisions")
    assert(decisions(301L) == "exact", s"batch2: $decisions")
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }

  test("SQL-first ingest loop: gate_decisions + admit foreachBatch equals the all-Scala loop") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    // Corpus + initial state (the one-time Scala setup a SQL-first team
    // runs once).
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    val root = Files.createTempDirectory("sqlgate").toString
    IngestGate.initSqlGateState(
      IngestGate.buildState(docs, embs, nlist = 4), s"$root/state")
    // Three micro-batches as jsonl files (maxFilesPerTrigger=1 — the
    // repo's deterministic micro-batch pattern), embeddings riding in
    // the row: b1 = a novel doc; b2 = its VERBATIM copy (catchable only
    // through batch-1's admit); b3 = a copy of an ORIGINAL state doc
    // plus a second novel doc.
    val novelText = "unrelated treatise on the migration patterns of " +
      "arctic terns across hemispheres every single year"
    val novel2 = "entirely different essay regarding deep sea vents and " +
      "the chemosynthetic bacteria thriving beside them in darkness"
    def row(id: Long, text: String, embOf: Int): String =
      s"""{"doc_id":$id,"text":"$text","embedding":[${
        stateEmb(embOf).mkString(",")}]}"""
    Files.createDirectories(Paths.get(s"$root/in"))
    Files.writeString(Paths.get(s"$root/in/b1.jsonl"), row(300, novelText, 300))
    Files.writeString(Paths.get(s"$root/in/b2.jsonl"), row(301, novelText, 300))
    Files.writeString(Paths.get(s"$root/in/b3.jsonl"),
      row(302, stateText(5), 5) + "\n" + row(303, novel2, 303))
    // The file source orders batches by modification time; three writes
    // in the same millisecond gave a nondeterministic order — pin it.
    Seq("b1", "b2", "b3").zipWithIndex.foreach { case (f, i) =>
      Files.setLastModifiedTime(Paths.get(s"$root/in/$f.jsonl"),
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 10000))
    }
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "1")
      .json(s"$root/in")
    // The whole write half is the one generic line.
    val q = streaming.Streams.toForeachBatchSink(stream, s"$root/ckpt")(
      IngestGate.sqlGateBatch(spark, s"$root/state") _)
    q.awaitTermination()
    // The per-batch serve caches drained at each commit (the scoped
    // registry's eviction point inside sqlGateBatch) — checked BEFORE
    // the all-Scala reference loop below, whose gate() calls fill the
    // batch scope again without a loop to drain it.
    assert(Dedup.batchIndexCount == 0)
    // The loop's queryable output: per-batch decision relations.
    val sqlDecisions = (0 to 2).flatMap { b =>
      spark.read.parquet(s"$root/state/b$b/decisions")
        .collect().map(r => (r.getLong(0),
          (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
    }.toMap
    // The all-Scala reference loop over the same batches.
    var state = IngestGate.buildState(docs, embs, nlist = 4)
    val scalaDecisions = scala.collection.mutable.Map[Long, (String, Long)]()
    for (f <- Seq("b1", "b2", "b3")) {
      val bd = spark.read
        .schema("doc_id BIGINT, text STRING, embedding ARRAY<FLOAT>")
        .json(s"$root/in/$f.jsonl").localCheckpoint()
      val bdocs = bd.select($"doc_id", $"text")
      val bemb = bd.select($"doc_id".as("vec_id"), $"embedding")
      val d = IngestGate.gate(state, bdocs, bemb).localCheckpoint()
      d.collect().foreach(r => scalaDecisions(r.getLong(0)) =
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      state = IngestGate.admit(state, d, bdocs, bemb)
    }
    assert(sqlDecisions == scalaDecisions.toMap,
      s"sql=$sqlDecisions scala=$scalaDecisions")
    // The content expectations themselves (not just loop equality).
    assert(sqlDecisions(300L)._1 == "pass")
    assert(sqlDecisions(301L) == ("exact", 300L))
    assert(sqlDecisions(302L) == ("exact", 5L))
    assert(sqlDecisions(303L)._1 == "pass")
    // Idempotence under at-least-once replay: re-running a committed
    // batch id is a no-op (marker short-circuit) — decisions unchanged
    // (batch 0 is b1.jsonl = doc 300 under the pinned file order).
    IngestGate.sqlGateBatch(spark, s"$root/state")(
      Seq((999L, "SHOULD NOT BE GATED", stateEmb(300)))
        .toDF("doc_id", "text", "embedding"), 0L)
    assert(spark.read.parquet(s"$root/state/b0/decisions")
      .collect().map(_.getLong(0)).toSeq == Seq(300L))
    // The restart path: a fresh consumer resumes from the newest
    // committed version.
    assert(IngestGate.latestGateStateDir(spark, s"$root/state")
      .endsWith("/b2"))
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }

  test("compact: an at-least-once replayed admit collapses to the replay-free state, decisions unchanged") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    val state0 = IngestGate.buildState(docs, embs, nlist = 4)
    val batch = Seq(
      (300L, "unrelated treatise on the migration patterns of arctic " +
        "terns across hemispheres every single year")
    ).toDF("doc_id", "text")
    val bEmb = Seq((300L, stateEmb(300))).toDF("vec_id", "embedding")
    val d = IngestGate.gate(state0, batch, bEmb).localCheckpoint()
    // The replay: the same (decisions, batch) admitted twice — the
    // at-least-once failure mode a checkpointed sink can produce.
    val once = IngestGate.admit(state0, d, batch, bEmb)
    val twice = IngestGate.admit(once, d, batch, bEmb)
    assert(twice.sims.count() == once.sims.count() + 1)
    assert(twice.assigned.count() == once.assigned.count() + 1)
    val compacted = IngestGate.compact(twice)
    // Byte-for-byte the replay-free state, per family.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(compacted.fps) == rows(once.fps))
    assert(rows(compacted.sims) == rows(once.sims))
    assert(rows(compacted.assigned) == rows(once.assigned))
    assert(compacted.simhashBits == twice.simhashBits)
    // And the gate behaves identically on the bloated and compacted
    // states: a verbatim copy of the admitted doc is caught either way.
    val b2 = Seq((301L, ("unrelated treatise on the migration patterns " +
      "of arctic terns across hemispheres every single year")))
      .toDF("doc_id", "text")
    val b2e = Seq((301L, stateEmb(300))).toDF("vec_id", "embedding")
    def decide(st: IngestGate.GateState) =
      IngestGate.gate(st, b2, b2e).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decide(twice) == decide(compacted))
    assert(decide(compacted)(301L) == "exact")
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }

  test("compact re-prices a grown auto state's radius; explicit widths warn only; statePolicy clamps stale radii") {
    import spark.implicits._
    // A state whose signature table has outgrown its build-time budget:
    // 5000 stored 60-bit signatures against a radius priced at build
    // (11 holds only to ~2.2k docs; the 5k budget is 10). Families the
    // re-pricing doesn't touch are minimal valid frames.
    val fps = Seq(("aa", 1L)).toDF("fp", "keep_id")
    val sims5k = (0 until 5000).map(i => (i.toLong, i.toLong * 7919))
      .toDF("doc_id", "simhash")
    val cents = Seq((0L, Array(0.0f))).toDF("cid", "centroid")
    val assigned = Seq((0L, 0L)).toDF("vec_id", "cid")
    val grown = IngestGate.GateState(fps, sims5k, cents, assigned,
      simhashBits = 60, simhashMaxDist = 11, simhashAuto = true)
    val c = IngestGate.compact(grown)
    assert(c.simhashMaxDist == 10,
      s"auto state must re-price 11 -> 10 at 5k docs: ${c.simhashMaxDist}")
    assert(IngestGate.budgetMaxDist(60, 5000) == 10)
    assert(IngestGate.budgetMaxDist(60, 50000) == 9)
    // A hand-constructed state with an explicit non-negative radius but
    // WITHOUT the auto opt-in carries caller semantics: compact warns
    // about the outgrown budget but leaves the radius alone (r15
    // advice — re-pricing used to key on the radius sign alone).
    val callerOwned = grown.copy(simhashAuto = false)
    assert(IngestGate.compact(callerOwned).simhashMaxDist == 11)
    // Explicit-width (reference-parity) state: same growth, radius is
    // width-derived (-1) — compact warns but never silently re-prices.
    val parity = IngestGate.GateState(fps, sims5k, cents, assigned,
      simhashBits = 16, simhashMaxDist = -1)
    assert(IngestGate.compact(parity).simhashMaxDist == -1)
    // statePolicy clamps a radius impossible under the stored width
    // (a width changed via copy outside resignSims, r14 advice): a
    // 16-bit state carrying the 60-bit radius 10 probes at 3, not 10.
    val stale = parity.copy(simhashMaxDist = 10)
    assert(IngestGate.statePolicy(stale) ==
      IngestGate.SimhashPolicy(16, 3, 0))
  }

  test("wide gate: 60-bit state catches the near-edit with a width-scaled maxDist") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    val state = IngestGate.buildState(docs, embs, nlist = 4, simhashBits = 60)
    // Hamming scales ~linearly with signature width (each bit is an
    // independent sign over the same feature diff): the one-word edit
    // measures 3/16 bits at the narrow width and 9/60 here, so the
    // equivalent wide threshold is maxDist ≈ bits · 3/16 — 11 at 60.
    val batchDocs = Seq(
      (100L, stateText(5)),
      (101L, stateText(7).replace("ripe", "rotten")),
      (103L, "unrelated treatise on the migration patterns of arctic " +
        "terns across hemispheres every single year")
    ).toDF("doc_id", "text")
    val batchEmb = Seq(
      (100L, stateEmb(5)), (101L, stateEmb(7)), (103L, stateEmb(103))
    ).toDF("vec_id", "embedding")
    val out = IngestGate.gate(state, batchDocs, batchEmb,
        maxDist = 11, minCos = 0.9).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out(100L) == (("exact", 5L)), s"d100: ${out(100L)}")
    assert(out(101L) == (("simhash", 7L)), s"d101: ${out(101L)}")
    assert(out(103L) == (("pass", -1L)), s"d103: ${out(103L)}")
    // admit must carry the width forward: a near-edit of the batch-1
    // survivor (d103) arriving in batch 2 is only catchable if batch 2
    // is signed at the STORED 60-bit width — a state that silently
    // reverted to 16 bits would chunk 60-bit signatures as 16-bit ones
    // and the tier would go blind.
    val d1 = IngestGate.gate(state, batchDocs, batchEmb,
      maxDist = 11, minCos = 0.9).localCheckpoint()
    val admitted = IngestGate.admit(state, d1, batchDocs, batchEmb)
    assert(admitted.simhashBits == 60)
    val b2Docs = Seq((200L,
      ("unrelated treatise on the migration patterns of arctic " +
        "terns across hemispheres every single year")
        .replace("arctic", "antarctic"))).toDF("doc_id", "text")
    val b2Emb = Seq((200L, stateEmb(103))).toDF("vec_id", "embedding")
    val out2 = IngestGate.gate(admitted, b2Docs, b2Emb,
        maxDist = 11, minCos = 0.9).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(out2(200L) == (("simhash", 103L)), s"d200: ${out2(200L)}")
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }

  test("wide signatures de-saturate the simhash tier at corpus scale") {
    import spark.implicits._
    // 2000 stored docs vs 5 genuinely novel batch docs. At 16 bits the
    // space holds 2^16 signatures and maxDist<=3 covers ~697 neighbors,
    // so each novel doc expects ~2000*697/65536 ≈ 21 collisions — the
    // tier misfires on NOVEL text (the GateProbe saturation, reproduced
    // at deterministic unit scale). At 60 bits the same ball covers
    // 2^-38 of the space (even the width-scaled maxDist=11 ball covers
    // ~2^-24) and the expected false-hit count is ~1e-7.
    val words = Array("alpha", "bravo", "cedar", "delta", "ember",
      "fjord", "grove", "haven", "islet", "joule", "krill", "lumen",
      "maple", "noble", "ochre", "pearl", "quartz", "raven", "sable",
      "tulip", "umber", "vapor", "walnut", "xenon", "yucca", "zephyr")
    def salad(seed: Int, n: Int): String =
      Array.tabulate(n)(k => words(
        math.abs(scala.util.hashing.MurmurHash3.productHash((seed, k)))
          % words.length)).mkString(" ")
    val docs = (0 until 2000).map(i => (i.toLong, salad(i, 30)))
      .toDF("doc_id", "text")
    val batch = (0 until 5).map(i => (9000L + i, salad(100000 + i, 30)))
      .toDF("doc_id", "text")
    val narrowHits = Dedup.simhashNearDupsFromState(
        Dedup.simhashes(docs), batch, 3)
      .select($"doc_id").distinct().count()
    val wideHits = Dedup.simhashNearDupsFromState(
        Dedup.simhashes(docs, 60), batch, 11, bits = 60)
      .select($"doc_id").distinct().count()
    assert(narrowHits > 0, "16-bit tier saturates: novel docs collide")
    assert(wideHits == 0, s"60-bit tier discriminates, got $wideHits hits")
    Dedup.releaseIndexes()
  }

  test("defaults protect the short novel doc; the 16-bit opt-in reproduces the false trim") {
    import spark.implicits._
    // 2000 stored docs; the batch doc is SHORT (6 words -> 4 shingles),
    // novel in text and embedding. Under the REFERENCE-PARITY 16-bit
    // opt-in (policy: maxDist=3, no shingle routing) its shallow
    // signature lands within maxDist of the saturated state by chance
    // (expected ~21 collisions) and the gate falsely trims it. Under
    // the DEFAULT state — no per-call width arguments anywhere — the
    // 60-bit width plus the minShingles=11 routing keep it alive.
    val words = Array("alpha", "bravo", "cedar", "delta", "ember",
      "fjord", "grove", "haven", "islet", "joule", "krill", "lumen",
      "maple", "noble", "ochre", "pearl", "quartz", "raven", "sable",
      "tulip", "umber", "vapor", "walnut", "xenon", "yucca", "zephyr")
    def salad(seed: Int, n: Int): String =
      Array.tabulate(n)(k => words(
        math.abs(scala.util.hashing.MurmurHash3.productHash((seed, k)))
          % words.length)).mkString(" ")
    def emb(id: Long): Seq[Float] = Array.tabulate(64)(j =>
      (scala.util.hashing.MurmurHash3.productHash((id, j)) % 1000) / 1000f)
      .toSeq
    val docs = (0 until 2000).map(i => (i.toLong, salad(i, 30)))
      .toDF("doc_id", "text")
    val embs = (0 until 2000).map(i => (i.toLong, emb(i.toLong)))
      .toDF("vec_id", "embedding")
    val shortDoc = Seq((9000L, "shingle fragment too short to sign"))
      .toDF("doc_id", "text")
    val shortEmb = Seq((9000L, emb(9000L))).toDF("vec_id", "embedding")
    val narrow = IngestGate.buildState(docs, embs, nlist = 8,
      simhashBits = 16)
    val trimmed = IngestGate.gate(narrow, shortDoc, shortEmb)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(trimmed(9000L) == "simhash",
      s"expected the saturated 16-bit tier to falsely trim: $trimmed")
    val state = IngestGate.buildState(docs, embs, nlist = 8)
    val kept = IngestGate.gate(state, shortDoc, shortEmb)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(9000L) == "pass", s"default gate should pass it: $kept")
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }

  test("simhashParams selects width by expected false-hit rate; defaults match its corpus-scale pick") {
    // The auto policy is ALWAYS the 60-bit ceiling — even for an
    // empty/tiny seed corpus (r14 advice): a state is priced once at
    // build time but grows through admit forever after, so a narrow
    // width that fits the seed would silently saturate as the corpus
    // grows (16 bits misfire from ~100 stored docs). The radius is
    // what scales with n: the full edit radius up to ~2k stored docs
    // and a budget-shrunk radius beyond — (60,10) at 5k, (60,9) at
    // 50k (which removes the measured at-floor false trim: the one
    // 11-shingle novel doc that chance-collided at distance 10 against
    // 50k signatures), (60,5) at 100M.
    assert(IngestGate.simhashParams(1) ==
      IngestGate.SimhashPolicy(60, 11, 11))
    assert(IngestGate.simhashParams(40) ==
      IngestGate.SimhashPolicy(60, 11, 11))
    assert(IngestGate.simhashParams(2000) ==
      IngestGate.SimhashPolicy(60, 11, 11))
    assert(IngestGate.simhashParams(5000) ==
      IngestGate.SimhashPolicy(60, 10, 11))
    assert(IngestGate.simhashParams(50000) ==
      IngestGate.SimhashPolicy(60, 9, 11))
    assert(IngestGate.simhashParams(100000000L) ==
      IngestGate.SimhashPolicy(60, 5, 11))
    // Within the 60-bit regime the radius never grows with n (the
    // budget only tightens; across the width switch the radius is
    // per-width, so the comparison starts where 60 bits begin).
    val rads = Seq(100L, 10000L, 1000000L, 100000000L, 10000000000L)
      .map(IngestGate.simhashParams(_).maxDist)
    assert(rads == rads.sorted.reverse, s"radii must be monotone: $rads")
    // Width-derived pieces are consistent with the policy.
    assert(IngestGate.widthMaxDist(16) == 3)
    assert(IngestGate.widthMaxDist(60) == 11)
    assert(IngestGate.widthMinShingles(16) == 0)
    assert(IngestGate.widthMinShingles(60) == 11)
    // buildState's auto policy lands the spec corpus at the full-radius
    // default and stores the radius in the state; an explicit width
    // keeps the width-derived radius (reference parity).
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    val auto = IngestGate.buildState(docs, embs, nlist = 4)
    assert(auto.simhashBits == 60 && auto.simhashMaxDist == 11)
    assert(IngestGate.statePolicy(auto) ==
      IngestGate.SimhashPolicy(60, 11, 11))
    val pinned = IngestGate.buildState(docs, embs, nlist = 4,
      simhashBits = 16)
    assert(pinned.simhashBits == 16 && pinned.simhashMaxDist == -1)
    assert(IngestGate.statePolicy(pinned) ==
      IngestGate.SimhashPolicy(16, 3, 0))
  }

  test("saveState/loadState persist the signature width; legacy layouts detect as 16-bit; resignSims migrates") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    val built = IngestGate.buildState(docs, embs, nlist = 4)
    val dir = java.nio.file.Files.createTempDirectory("gatesave").toString
    IngestGate.saveState(built, s"$dir/state")
    val loaded = IngestGate.loadState(spark, s"$dir/state")
    assert(loaded.simhashBits == 60)
    // The budget radius rides in the meta table with the width.
    assert(loaded.simhashMaxDist == built.simhashMaxDist &&
      loaded.simhashMaxDist == 11)
    // The loaded state serves identically to the built one.
    val batchDocs = Seq(
      (101L, stateText(7).replace("ripe", "rotten"))).toDF("doc_id", "text")
    val batchEmb = Seq((101L, stateEmb(7))).toDF("vec_id", "embedding")
    def decide(st: IngestGate.GateState) =
      IngestGate.gate(st, batchDocs, batchEmb).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decide(loaded) == decide(built))
    assert(decide(loaded)(101L) == "simhash")
    // A legacy layout — the four tables, no meta — is a pre-width
    // state: 16-bit by construction, and loadState must say so rather
    // than silently mis-chunk 16-bit signatures as 60-bit ones.
    val narrow = IngestGate.buildState(docs, embs, nlist = 4,
      simhashBits = 16)
    narrow.fps.write.parquet(s"$dir/legacy/fps")
    narrow.sims.write.parquet(s"$dir/legacy/sims")
    narrow.cents.write.parquet(s"$dir/legacy/cents")
    narrow.assigned.write.parquet(s"$dir/legacy/assigned")
    val legacy = IngestGate.loadState(spark, s"$dir/legacy")
    assert(legacy.simhashBits == 16)
    assert(decide(legacy)(101L) == "simhash") // 16-bit policy: maxDist=3
    // Migration: re-sign from the raw corpus at 60 — equal to a fresh
    // 60-bit build, signature table and width alike.
    val migrated = IngestGate.resignSims(legacy, docs, 60)
    assert(migrated.simhashBits == 60)
    assert(migrated.sims.collect().map(_.toSeq).toSet ==
      built.sims.collect().map(_.toSeq).toSet)
    assert(decide(migrated) == decide(built))
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }

  test("soak: 20 micro-batches of gate→admit→compact with replays, parquet state, and a mid-soak reindex") {
    import spark.implicits._
    // The composed longevity run the individual pieces never exercise
    // together: per batch — gate, admit, parquet save/load of the whole
    // state; at-least-once REPLAYED admits at batches 3/8/13/18;
    // compaction at every 5th batch; ivfAssignCost drift check every
    // batch; a full ivfReindex at batch 10. Claims proven:
    //   1. decisions at every batch equal a replay-free run's,
    //   2. state row counts end exactly O(corpus): base + one row per
    //      survivor, replays compacted away,
    //   3. prior decisions remain valid across the mid-soak reindex.
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    def novelId(k: Int): Long = 1000L + 10L * k
    // ~51 tokens, 44 of them k-dependent filler, so the one-word edit
    // touches 3 of ~49 shingles (hamming 2-11 of the 60-bit budget,
    // maxDist 11) while every novel pair — not just consecutive ones —
    // stays at distance ≥ 17 (measured over all 190 pairs + the 40
    // base docs; a shared template scaffold put non-adjacent novels
    // inside the ball).
    def novelText(k: Int): String = {
      val filler = Array.tabulate(44)(p => "w" + ((k * 131 + p * 17) % 9973))
      s"soak batch $k chronicle weaving through chapter ${k * 7} " +
        filler.mkString(" ")
    }
    def embOf(id: Long): Seq[Float] = Array.tabulate(64)(j =>
      (scala.util.hashing.MurmurHash3.productHash((id, j)) % 1000) / 1000f)
      .toSeq
    def near(base: Seq[Float]): Seq[Float] = base.map(x => x + 0.001f)
    // Batch k: one novel doc, plus a verbatim / one-word-edit /
    // embedding-near dup of the PREVIOUS batch's survivor (batch 1
    // targets corpus doc 5) — every tier fires every batch, and every
    // catch after batch 1 depends on the admitted loop.
    def batchOf(k: Int): (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
      val (prevText, prevEmb) =
        if (k == 1) (stateText(5), stateEmb(5))
        else (novelText(k - 1), embOf(novelId(k - 1)))
      val bd = Seq(
        (novelId(k), novelText(k)),
        (novelId(k) + 1, prevText),
        (novelId(k) + 2, prevText.replace("through", "across")),
        (novelId(k) + 3, s"entirely fresh prose for batch $k describing " +
          s"harvest rites in village ${k * 19} with lanterns drums and " +
          s"long processions after dusk")
      ).toDF("doc_id", "text")
      val be = Seq(
        (novelId(k), embOf(novelId(k))),
        (novelId(k) + 1, prevEmb),
        (novelId(k) + 2, prevEmb),
        (novelId(k) + 3, near(prevEmb))
      ).toDF("vec_id", "embedding")
      (bd, be)
    }
    val root = java.nio.file.Files.createTempDirectory("gatesoak").toString
    def runSoak(replays: Boolean, persist: Boolean)
        : (Map[Long, (String, Long)], IngestGate.GateState) = {
      var state = IngestGate.buildState(docs, embs, nlist = 4)
      val all = scala.collection.mutable.Map[Long, (String, Long)]()
      for (k <- 1 to 20) {
        val (bd, be) = batchOf(k)
        val d = IngestGate.gate(state, bd, be).localCheckpoint()
        d.collect().foreach(r => all(r.getLong(0)) =
          (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
        var st = IngestGate.admit(state, d, bd, be)
        if (replays && k % 5 == 3) st = IngestGate.admit(st, d, bd, be)
        if (k % 5 == 0) st = IngestGate.compact(st)
        if (k == 10) {
          val (c2, a2) = Similarity.ivfReindex(st.assigned, nlist = 4)
          st = st.copy(cents = c2, assigned = a2)
        }
        val drift = Similarity.ivfAssignCost(st.cents, st.assigned)
        assert(!drift.isNaN && drift >= 0.0, s"batch $k drift: $drift")
        state =
          if (persist) {
            IngestGate.saveState(st, s"$root/b$k")
            IngestGate.loadState(spark, s"$root/b$k")
          } else st.copy(
            fps = st.fps.localCheckpoint(),
            sims = st.sims.localCheckpoint(),
            cents = st.cents.localCheckpoint(),
            assigned = st.assigned.localCheckpoint())
      }
      (all.toMap, state)
    }
    val (withReplays, finalState) = runSoak(replays = true, persist = true)
    // Every batch decided every tier correctly, against the LOOP's
    // survivors (not just the original corpus).
    for (k <- 1 to 20) {
      val prev = if (k == 1) 5L else novelId(k - 1)
      assert(withReplays(novelId(k)) == (("pass", -1L)), s"b$k novel")
      assert(withReplays(novelId(k) + 1) == (("exact", prev)), s"b$k exact")
      assert(withReplays(novelId(k) + 2) == (("simhash", prev)), s"b$k edit")
      assert(withReplays(novelId(k) + 3) == (("embedding", prev)),
        s"b$k embnear")
    }
    // Replay-free run (in-memory state): identical decisions at every
    // batch — replays are invisible to the gate, not merely tolerable.
    val (noReplays, _) = runSoak(replays = false, persist = false)
    assert(noReplays == withReplays)
    // State stays O(corpus): batch 20 compacted, so exactly base rows +
    // one per admitted survivor in every family (all texts are long
    // enough to sign; the replayed appends are gone).
    assert(finalState.sims.count() == 40L + 20L)
    assert(finalState.assigned.count() == 40L + 20L)
    assert(finalState.fps.count() == 40L + 20L)
    // The mid-soak reindex preserved decision validity: batch 10's dup
    // docs re-gated against the FINAL state are still caught with the
    // same survivors (and the batch-10 survivor remains its own keep).
    val (b10d, b10e) = batchOf(10)
    val regate = IngestGate.gate(finalState, b10d, b10e).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
    assert(regate(novelId(10) + 1) == (("exact", novelId(9))))
    assert(regate(novelId(10) + 2) == (("simhash", novelId(9))))
    assert(regate(novelId(10) + 3) == (("embedding", novelId(9))))
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }

  test("admit mirrors the shingle floor: short survivors get no signature row in state") {
    import spark.implicits._
    val docs = (0 until 40).map(i => (i.toLong, stateText(i)))
      .toDF("doc_id", "text")
    val embs = (0 until 40).map(i => (i.toLong, stateEmb(i)))
      .toDF("vec_id", "embedding")
    val state0 = IngestGate.buildState(docs, embs, nlist = 4)
    // One long novel survivor (signed) and one short novel survivor
    // (routed at the gate AND skipped at admit): its shallow signature,
    // stored, could chance-trim future long docs.
    val longText = "unrelated treatise on the migration patterns of " +
      "arctic terns across hemispheres every single year"
    val batch = Seq((300L, longText),
      (301L, "short novel fragment stays unsigned"))
      .toDF("doc_id", "text")
    val bEmb = Seq((300L, stateEmb(300)), (301L, stateEmb(301)))
      .toDF("vec_id", "embedding")
    val d = IngestGate.gate(state0, batch, bEmb).localCheckpoint()
    assert(d.filter($"stage" === "pass").count() == 2)
    val state1 = IngestGate.admit(state0, d, batch, bEmb)
    val simIds = state1.sims.select($"doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(simIds.contains(300L), "long survivor signed into state")
    assert(!simIds.contains(301L), "short survivor must not be signed")
    // Both survivors still enter the exact and embedding families.
    assert(state1.fps.filter($"keep_id" === 301L).count() == 1)
    assert(state1.assigned.filter($"vec_id" === 301L).count() == 1)
    Dedup.releaseIndexes()
    Similarity.releaseIndexes()
  }
}
