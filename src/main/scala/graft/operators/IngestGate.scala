package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed per-batch ingest gate: the three serve-half dedup
  * operators the engine already proves individually — exact fingerprint
  * (q24's md5 groups), SimHash (q96's signature state probe), and
  * embedding cosine (q95's IVF state probe) — chained as a
  * short-circuit cascade over shared persisted state, cheapest filter
  * first. A real ingest pipeline runs exactly this order because each
  * stage's cost and selectivity differ by orders of magnitude: the
  * exact join trims verbatim re-crawls for one hash join; SimHash
  * trims near-verbatim edits for a signature probe; the embedding
  * probe — the only stage that needs vectors at all — sees only what
  * survived both.
  *
  * Reference anchor: the reference pipeline's per-run dedup is the
  * resume anti-join + in-page set (robust_scraper.py:137-189 applied
  * per page); this gate is that idea grown to the three-tier content
  * form a 100 TB corpus needs.
  *
  * Scale shape: every stage is a broadcast of the (small) surviving
  * batch against partitioned/pruned state — the fingerprint join
  * broadcasts the batch fps, the SimHash probe broadcasts the batch
  * signature chunks against the chunk-bucketed state, the IVF probe
  * broadcasts the batch's probe rows against the probed lists. Nothing
  * state-sized shuffles; the cascade's lineage is three anti-joins
  * deep, well under the materialization threshold the curation-flow
  * lesson set (CurationFlowSpec's localCheckpoint rule).
  */
object IngestGate {

  /** The gate's persisted state: one table per stage plus the IVF
    * centroids — all plain parquet, the same shapes the individual
    * serve operators build ([[Dedup.exactDedupGroups]]-style fps,
    * [[Dedup.simhashes]], [[Similarity.ivfIndex]]).
    */
  final case class GateState(fps: DataFrame, sims: DataFrame,
      cents: DataFrame, assigned: DataFrame, simhashBits: Int = 16)

  /** Build all three state tables from a document corpus and its
    * embeddings (embeddings keyed by the SAME ids as doc_id). Each
    * piece is exactly what the stage's standalone serve operator
    * expects, so state persisted by this builder interoperates with
    * q77/q95/q96-style per-family flows.
    *
    * `simhashBits` sizes the SimHash tier's signature space and rides
    * in the state so gate/admit always sign at the stored width. The
    * 16-bit default matches the reference's shape and the q96 oracle,
    * but saturates at ~5k stored docs (GateProbe: every novel doc has a
    * hamming≤3 neighbor once ~700·n approaches 2¹⁶) — corpus-scale
    * deployments should build at 60 (the q101/q102 width), where the
    * same neighbor ball covers 2⁻³⁸ of the space.
    */
  def buildState(docs: DataFrame, embeddings: DataFrame,
      nlist: Int = 16, simhashBits: Int = 16): GateState = {
    import docs.sparkSession.implicits._
    val fps = docs
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .groupBy($"fp").agg(min($"doc_id").as("keep_id"))
    val sims = Dedup.simhashes(docs, simhashBits)
    val (cents, assigned) = Similarity.ivfIndex(embeddings, nlist = nlist)
    GateState(fps, sims, cents, assigned, simhashBits)
  }

  /** Run one batch through the cascade. `batchEmb` carries (vec_id,
    * embedding) rows keyed by the batch's doc_ids (docs without an
    * embedding simply cannot be trimmed by the embedding stage).
    *
    * Returns one decision row PER BATCH DOC:
    *   (doc_id, stage, dup_of) —
    * stage ∈ exact | simhash | embedding names the trimming stage
    * (dup_of = the kept corpus doc, smallest id among hits — a
    * deterministic choice, not a partition-order one), or 'pass' with
    * null dup_of for survivors. A doc similar at several tiers is
    * reported ONLY at the earliest (cheapest) one — later stages never
    * see it, which is the short-circuit the cascade exists for. The
    * per-stage trim accounting CurationFlowSpec-style reports need is
    * one groupBy(stage) away.
    */
  def gate(state: GateState, batchDocs: DataFrame, batchEmb: DataFrame,
      maxDist: Int = 3, minCos: Double = 0.9,
      nprobe: Int = 4, minShingles: Int = 0): DataFrame = {
    import batchDocs.sparkSession.implicits._
    def hits(pairs: DataFrame, stage: String): DataFrame =
      pairs.groupBy($"doc_id").agg(min($"dup_of").as("dup_of"))
        .select($"doc_id", lit(stage).as("stage"), $"dup_of")

    // Stage 1 — exact fingerprint: one join of the batch's md5 rows
    // against the fp state; a state fp row exists per distinct text.
    val bfp = batchDocs
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
    val exactHits = hits(bfp.join(state.fps, Seq("fp"))
      .filter($"doc_id" =!= $"keep_id")
      .select($"doc_id", $"keep_id".as("dup_of")), "exact")
    val s1 = batchDocs.join(broadcast(exactHits.select($"doc_id")),
      Seq("doc_id"), "left_anti")

    // Stage 2 — SimHash: survivors signed batch-locally (a signature
    // depends only on its own text) and probed via the q96 serve path.
    // minShingles > 0 routes very short survivors AROUND this tier:
    // signature stability scales with feature count (each bit is the
    // sign of a ±1 sum over the doc's shingles — at ~10 shingles the
    // sums are shallow and the bits near-random), so a short novel doc
    // can land within maxDist of stored signatures by chance and be
    // falsely trimmed (measured: the 50k-doc GATEPROBE-WIDE false hit;
    // catastrophically at 16 bits, where 50k stored docs collide at
    // distance ZERO). Bypassed docs still face the exact tier before
    // and the content-based embedding tier after — they lose only the
    // unreliable signature check, never dedup coverage.
    val simInput =
      if (minShingles <= 0) s1
      else s1.join(broadcast(
        Dedup.shingleRows(s1).groupBy($"doc_id")
          .agg(count(lit(1)).as("_n")).filter($"_n" >= minShingles)
          .select($"doc_id")), Seq("doc_id"))
    val simHits = hits(
      Dedup.simhashNearDupsFromState(state.sims, simInput, maxDist,
          state.simhashBits)
        .select($"doc_id", $"dup_of"), "simhash")
    val s2 = s1.join(broadcast(simHits.select($"doc_id")),
      Seq("doc_id"), "left_anti")

    // Stage 3 — embedding cosine: only the remaining survivors' vectors
    // are even read; the q95 serve path probes the IVF state.
    val s2emb = batchEmb.join(
      broadcast(s2.select($"doc_id".as("vec_id"))), Seq("vec_id"))
    val embHits = hits(
      Similarity.cosineNearDupsFromIndex(state.cents, state.assigned,
          s2emb, minCos, nprobe)
        .select($"vec_id".as("doc_id"), $"dup_of"), "embedding")

    val trimmed = exactHits.unionByName(simHits).unionByName(embHits)
    batchDocs.select($"doc_id")
      .join(trimmed, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"stage", lit("pass")).as("stage"),
        $"dup_of")
  }

  /** Admit a batch's survivors into the gate state — the append half
    * that closes the ingest loop: [[gate]] DECIDES, `admit` makes the
    * decision durable, so batch N+1 dedups against batch N's survivors
    * and not just the original corpus. One row per survivor lands in
    * each state family:
    *
    *  - fingerprints: the survivor's (fp, keep_id=doc_id) rows —
    *    same-fp survivors of ONE batch (the gate checks the batch
    *    against STATE, not against itself) collapse batch-locally to
    *    the smaller id;
    *  - simhashes: the survivor's signature rows (batch-local compute,
    *    [[Dedup.simhashes]]);
    *  - IVF assignment: the survivor's vectors assigned to the EXISTING
    *    centroids ([[Similarity.ivfAssign]] — the FAISS `add`-without-
    *    retrain path; [[Similarity.ivfAssignCost]] is the drift metric
    *    that says when to stop appending and rebuild, and
    *    [[Similarity.ivfReindex]] the rebuild).
    *
    * Centroids are returned unchanged. All three appends are
    * batch-sized unions — the state side is never shuffled, grouped, or
    * deduplicated here (the q77 state pattern): exactly-once belongs to
    * the checkpointed foreachBatch sink that persists the state, and
    * every gate consumer is duplicate-tolerant anyway (each stage
    * aggregates hits by min(dup_of), so a replayed state row changes
    * nothing but wasted bytes). Every piece stays interoperable with
    * the per-family serve operators (q77/q95/q96).
    */
  def admit(state: GateState, decisions: DataFrame, batchDocs: DataFrame,
      batchEmb: DataFrame): GateState = {
    import batchDocs.sparkSession.implicits._
    val survivors = decisions.filter($"stage" === "pass")
      .select($"doc_id").distinct()
    val sDocs = batchDocs.join(broadcast(survivors), Seq("doc_id"))
    val newFps = state.fps.unionByName(
      sDocs.select(TextAnalysis.fingerprint($"text").as("fp"), $"doc_id")
        .groupBy($"fp").agg(min($"doc_id").as("keep_id")))
    val newSims = state.sims.unionByName(
      Dedup.simhashes(sDocs, state.simhashBits))
    val sEmb = batchEmb.join(
      broadcast(survivors.select($"doc_id".as("vec_id"))), Seq("vec_id"))
    val newAssigned = state.assigned.unionByName(
      Similarity.ivfAssign(state.cents, sEmb))
    state.copy(fps = newFps, sims = newSims, assigned = newAssigned)
  }

  /** Compact gate state grown by [[admit]] under at-least-once replay:
    * every consumer is duplicate-tolerant (each tier aggregates hits by
    * min), so replayed appends are never WRONG — but each replay is
    * dead rows every subsequent serve scans. Compaction is the
    * periodic maintenance a real deployment runs under the sink's
    * batch-id gate, alongside the drift check
    * ([[Similarity.ivfAssignCost]] → [[Similarity.ivfReindex]] when the
    * centroids themselves have staled):
    *
    *  - fingerprints: min-merge per fp (the same reduction every gate
    *    consumer applies on read — compaction just makes it durable);
    *  - simhashes / assignment: one row per doc/vec id (signatures and
    *    assignments are pure functions of the stored content and
    *    centroids, so replayed rows are exact copies and any
    *    representative is THE row).
    *
    * One shuffle per family, each keyed the way its serve side already
    * blocks, and the result is byte-for-byte what a replay-free run
    * would have produced — gate decisions are identical before and
    * after (the spec drives both).
    */
  def compact(state: GateState): GateState = {
    import state.fps.sparkSession.implicits._
    state.copy(
      fps = state.fps.groupBy($"fp").agg(min($"keep_id").as("keep_id")),
      sims = state.sims.dropDuplicates("doc_id"),
      assigned = state.assigned.dropDuplicates("vec_id"))
  }
}
