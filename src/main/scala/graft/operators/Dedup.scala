package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fp._

/** Deduplication operators (reference D1-D5, SURVEY.md §2.6) plus the
  * near-dup family a training-data pipeline needs at 100 TB.
  *
  * Scale design:
  *  - exact dedup = hash-groupBy on a content fingerprint — one shuffle on
  *    an already-compact key;
  *  - exact Jaccard near-dup = shingle inverted-index self-join. Correct
  *    but O(Σ df²) in shingle document-frequency; at 100 TB you first cut
  *    stop-shingles (df > threshold drops hot keys, AQE skew-join handles
  *    the rest) or switch to the MinHash-LSH variant;
  *  - MinHash-LSH = signatures computed per row (no shuffle), one shuffle
  *    on (band, bandHash) to bucket candidates, then exact-Jaccard verify
  *    of candidates only. Probability of missing a pair with j ≥ 0.9 at
  *    16 bands × 4 rows is (1 - j⁴)¹⁶ < 5e-8 — the verify step makes
  *    emitted pairs exact;
  *  - SimHash = per-row 16-bit signature; hamming-adjacent bucketing is a
  *    single groupBy on the signature.
  *
  * All hashing is md5-derived (graft.functions.Fp) — deterministic across
  * engines, partitionings and retries; no RNG state anywhere.
  */
object Dedup {

  /** The ONE shingle index every near-dup operator shares, cached in its
    * PER-DOC ARRAY form: (doc_id, ss) with ss = the SORTED DISTINCT
    * hash60(md5) values of the doc's 3-gram shingle strings; docs with
    * fewer than 3 tokens (no shingles) have no row — the same contract
    * as the old exploded form. One representation serves every consumer:
    * the exploded (doc_id, s64) inverted-index view ([[shingleRows]]) is
    * a map-side explode of this cache; the sorted-set view the exact
    * verify and the MinHash signer need IS this cache (it used to be a
    * separate collect_list shuffle); per-doc shingle counts are size()
    * over it. Collision odds at 2⁶⁰ over ~10⁶ shingles are ~10⁻⁶; a
    * collision would surface as an oracle mismatch, not silent
    * corruption.
    *
    * Build shape — the r18 point: per-doc distinct is ROW-LOCAL (all of
    * a doc's 3-grams come from its own token array), so the whole index
    * build is one map-side pass: split once into a named `toks` column,
    * transform over the gram-start index range with element_at reads
    * (the lambda binds the materialized array attribute, never the
    * split(text) expression — a lambda body referencing the outer split
    * re-evaluates it per element, measured ~50× per row), then
    * array_distinct + array_sort per row. NO shuffle at all — the old
    * exploded form paid a full (doc_id, s64) distinct exchange to
    * deduplicate pairs that were never spread across partitions in the
    * first place (guide §2.4: remove shuffles outright), and its
    * consumers paid collect_list shuffles to UNDO the explode. The
    * array_distinct/array_sort expressions are safe from Catalyst
    * project-collapse re-evaluation BECAUSE the result is persisted:
    * consumers read the InMemoryRelation attribute, not the expression
    * tree (the r10 minhash lesson — an inline array column collapsed
    * into 64 permutation lambdas re-evaluated the build 64× per row).
    * CacheManager keys on the canonical plan, so sibling operators over
    * the same corpus share one copy ([[releaseIndexes]] frees them).
    */
  private[operators] def shingleArrays(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val grams = transform(
      sequence(lit(1), size($"toks") - 2),
      i => hash60(concat_ws(" ", element_at($"toks", i),
        element_at($"toks", i + 1), element_at($"toks", i + 2))))
    cacheIndex(docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= 3)
      .select($"doc_id", array_sort(array_distinct(grams)).as("ss")))
  }

  /** The exploded (doc_id, s64) inverted-index view of [[shingleArrays]]
    * — a map-side explode of the cache, NOT a second cached table (the
    * explode is cheap against the columnar cache, and caching both forms
    * would double the index's memory).
    */
  private[operators] def shingleRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    shingleArrays(docs).select($"doc_id", explode($"ss").as("s64"))
  }

  /** Per-doc distinct-shingle counts — size() over the cached array
    * form: map-side, no aggregate (the old form paid a groupBy(doc_id)
    * count over the exploded index).
    */
  private[operators] def shingleCounts(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    shingleArrays(docs).select($"doc_id", size($"ss").cast("long").as("_n"))
  }

  /** Registry for every derived index this family persists (shingle
    * rows, prefix table, band table, per-doc shingle sets, verified pair
    * sets, converged cluster labels) — see [[graft.CacheRegistry]].
    *
    * Two scopes (r15 advice): CORPUS indexes live session-long in
    * `registry`; PER-BATCH frames (an arriving micro-batch's signatures
    * and shingles in the serve operators) land in `batchRegistry`
    * instead, so a long-lived ingest loop can evict them once the
    * batch's decisions are materialized — without them, every served
    * batch left its signature/shingle frames persisted until a full
    * [[releaseIndexes]]. Construction that builds batch-lifetime frames
    * wraps itself in [[batchScope]]; everything else defaults to the
    * session registry.
    */
  private val registry = new graft.CacheRegistry
  private val batchRegistry = new graft.CacheRegistry
  private val batchScopeOn = new scala.util.DynamicVariable[Boolean](false)

  /** Route [[cacheIndex]] calls inside `body` to the batch-scoped
    * registry — used by the serve-side operators around their
    * batch-derived frames (plan construction is eager, so wrapping the
    * construction site is sufficient).
    */
  private[graft] def batchScope[T](body: => T): T =
    batchScopeOn.withValue(true)(body)

  private[operators] def cacheIndex(df: DataFrame): DataFrame =
    (if (batchScopeOn.value) batchRegistry else registry).cache(df)

  /** Unpersist every per-batch frame cached by the serve operators —
    * call once per micro-batch, after the batch's decision boundary is
    * materialized (the foreachBatch recipe in
    * [[graft.operators.IngestGate]] does). Corpus-lifetime indexes are
    * untouched.
    */
  def releaseBatchIndexes(): Unit = batchRegistry.release()
  private[graft] def batchIndexCount: Int = batchRegistry.size

  /** Public face of the shared shingle index for sibling operator
    * families (e.g. Reporting.sourceOverlap).
    */
  def shingleIndex(docs: DataFrame): DataFrame = shingleRows(docs)

  /** Unpersist every index cached by the near-dup operators. Call
    * between corpora in a long-lived session.
    */
  def releaseIndexes(): Unit = { registry.release(); batchRegistry.release() }

  /** Exact 3-gram Jaccard similarity join via prefix filtering (AllPairs /
    * PPJoin family): all pairs with j >= minJ, no approximation.
    *
    * A naive inverted-index self-join costs Σ df² over shingle document
    * frequencies — hot (common) shingles dominate and it blows up exactly
    * when the corpus grows. Prefix filtering bounds this: order each
    * document's shingles by ascending global df (rare first; (df, hash)
    * is a total order), and keep only the first n − ⌈t·n⌉ + 1 as the
    * document's *prefix*. Completeness: for any pair with j ≥ t the sizes
    * are within ratio t, so the required overlap is ≥ ⌈t·n⌉ per side; if
    * a document shared nothing from its prefix, all shared shingles would
    * fit in its ⌈t·n⌉−1 suffix — contradiction. So candidates = pairs
    * sharing ≥1 *prefix* shingle (joined on rare keys only), then an
    * exact intersection count over the candidates decides.
    *
    * At sf0.1 this replaced a 14.7 s hot-shingle join; at 100 TB it is
    * the difference between Σ df² on stop-shingles and a join keyed
    * almost entirely by rare shingles.
    */
  def jaccardNearDups(docs: DataFrame, minJ: Double): DataFrame =
    jaccardNearDups(docs, minJ, Long.MaxValue)

  /** Default stop-shingle cut for the Jaccard join (mirrors
    * [[Reporting.defaultStopShingleDf]]): above test-scale document
    * frequencies (max df 25 at sf0.1) so small corpora see the exact
    * result, while a real corpus — where boilerplate shingles reach
    * df ≈ corpus size and dominate the Σ df² join — gets the cut by
    * default rather than only when a caller remembers to ask for it.
    */
  val defaultMaxDf = 100L

  /** As above, with an explicit stop-shingle cut: shingles with document
    * frequency > maxDf are dropped from every document's set BEFORE
    * sizes/prefixes/verification, so the Jaccard computed is over
    * informative shingles only. Stop-shingles are exactly the keys whose
    * df² join work dominates at corpus scale and whose presence says
    * nothing about duplication; the default (no cut) keeps the operator
    * exact. The cut is one extra s64 exchange, which the prefix df
    * window below then reuses.
    */
  def jaccardNearDups(docs: DataFrame, minJ: Double, maxDf: Long): DataFrame = {
    import docs.sparkSession.implicits._
    // All three per-row statistics as window functions: df needs one
    // exchange on s64, then n and rn share the doc_id exchange (adjacent
    // Window operators over the same partitioning reuse it). Two shuffles
    // total, vs two aggregates plus two joins in the naive formulation —
    // at 100 TB the joins would move the whole index twice more. The
    // stop-shingle cut rides the SAME df window (cutting whole s64 groups
    // doesn't change surviving shingles' df), so bounded and unbounded
    // cost identical shuffles.
    val sh0 = shingleRows(docs)
    val withDf = sh0
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"s64")))
    // shPrefix feeds the df-ordered prefix window; shSets feeds the exact
    // verify (which never needs df — keep the no-cut sets subtree free of
    // the window entirely).
    val (shPrefix, shSets) =
      if (maxDf == Long.MaxValue) (withDf, sh0)
      else {
        val cut = cacheIndex(withDf.filter($"df" <= maxDf))
        (cut, cut)
      }
    val prefix = cacheIndex(shPrefix
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df".asc, $"s64".asc)))
      .filter($"rn" <= $"n" - ceil(lit(minJ) * $"n") + 1)
      .select($"doc_id", $"s64", $"n"))
    // Candidates keep their multiplicity (one row per shared prefix
    // shingle): deduplicating 200k candidate rows costs a full shuffle,
    // while re-verifying a duplicate costs one broadcast-join probe — the
    // distinct moves to the verified output (~few hundred rows, free).
    val cand = prefix.as("x").join(prefix.as("y"),
        col("x.s64") === col("y.s64") && col("x.doc_id") < col("y.doc_id") &&
          least(col("x.n"), col("y.n")).cast("double") >=
            lit(minJ) * greatest(col("x.n"), col("y.n")))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    // The verified pair set is tiny (true near-dups) and is consumed
    // again by downstream operators (clustering) — cache the output, not
    // just the build inputs.
    cacheIndex(verifyJaccard(cand, shSets, minJ).distinct())
  }

  /** Asymmetric containment join (q91): ordered pairs (doc_a, doc_b)
    * where doc_a's shingle set is mostly inside doc_b's —
    * C(a→b) = |Sa ∩ Sb| / |Sa| ≥ minC. Jaccard misses exactly this case:
    * a paragraph quoted inside a much larger page has tiny j but
    * containment ≈ 1, and a training pipeline wants the quoted copy
    * found (cross-doc quotation/boilerplate, the asymmetric cousin of
    * the reference's in-page dedup D1). Both directions are emitted
    * independently — containment is not symmetric.
    *
    * Prefix filtering only constrains the CONTAINED side: if
    * C(a→b) ≥ t then the overlap is ≥ ⌈t·na⌉, so doc_a must share at
    * least one of its first na − ⌈t·na⌉ + 1 df-ordered shingles with
    * doc_b (else all shared shingles would fit in the ⌈t·na⌉ − 1
    * suffix). The container side has no size bound and stays fully
    * indexed — the join cost is Σ over prefix (i.e. rare-first) shingles
    * of their df, which the stop-shingle cut bounds exactly like q26's
    * Σ df². The cut subtree is built expression-identical to
    * [[jaccardNearDups]]'s so CacheManager shares one copy per session.
    */
  def containmentDups(docs: DataFrame, minC: Double,
      maxDf: Long = defaultMaxDf): DataFrame = {
    import docs.sparkSession.implicits._
    val sh0 = shingleRows(docs)
    val withDf = sh0
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"s64")))
    val cut = cacheIndex(withDf.filter($"df" <= maxDf))
    val prefix = cacheIndex(cut
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"doc_id")))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df".asc, $"s64".asc)))
      .filter($"rn" <= $"n" - ceil(lit(minC) * $"n") + 1)
      .select($"doc_id", $"s64"))
    val cand = prefix.as("x").join(cut.as("y"),
        col("x.s64") === col("y.s64") && col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val sets = sortedSets(cut)
    cacheIndex(cand
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select($"doc_a", $"doc_b",
        graft.functions.VecExprs.intersectCountSorted(
          col("sa.ss"), col("sb.ss")).as("c"),
        size(col("sa.ss")).cast("long").as("na"))
      .select($"doc_a", $"doc_b",
        ($"c".cast("double") / $"na").as("containment"))
      .filter($"containment" >= minC)
      .distinct())
  }

  /** Exact-Jaccard verification of candidate pairs against compact
    * per-doc shingle-set arrays: two joins on doc_id (each moving one
    * ~|shingles| array row per doc — broadcastable for small corpora,
    * a single array shuffle at scale) and a codegen array_intersect per
    * pair. The previous formulation re-exploded the inverted index per
    * candidate side and hash-aggregated the matches — a candidate×shingle
    * intermediate that dominated q26/q27 runtime.
    */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame,
      minJ: Double): DataFrame =
    verifyJaccardSets(cand, sortedSets(sh), minJ)

  /** The ONE (doc_id, ss) sorted shingle-set formulation — shared by the
    * exact verify, the MinhashBands signature stage, and the persisted
    * state builder. A single definition, not three copies: CacheManager
    * shares cached plans only when they canonicalize identically, so any
    * drift between the sites (an added distinct, a changed sort) would
    * silently double-build the table instead of sharing one copy.
    * Sorted because the native two-pointer intersect
    * (graft.functions.IntersectCountSorted) requires it — array_intersect's
    * per-pair hash set build was ~100 CPU-s over the sf0.1 candidates.
    */
  private def sortedSets(sh: DataFrame): DataFrame = {
    import sh.sparkSession.implicits._
    cacheIndex(sh.groupBy($"doc_id")
      .agg(sort_array(collect_list($"s64")).as("ss")))
  }

  /** As [[verifyJaccard]], but against pre-built (doc_id, ss) sorted
    * shingle-set rows — the shape persisted dedup state arrives in.
    */
  private def verifyJaccardSets(cand: DataFrame, sets: DataFrame,
      minJ: Double): DataFrame = {
    import cand.sparkSession.implicits._
    cand
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select($"doc_a", $"doc_b",
        graft.functions.VecExprs.intersectCountSorted(
          col("sa.ss"), col("sb.ss")).as("c"),
        size(col("sa.ss")).cast("long").as("na"),
        size(col("sb.ss")).cast("long").as("nb"))
      .select($"doc_a", $"doc_b",
        ($"c".cast("double") / ($"na" + $"nb" - $"c")).as("jaccard"))
      .filter($"jaccard" >= minJ)
  }

  /** (doc_id, band, bandHash) rows from ONE native codegen expression
    * ([[graft.functions.MinhashBands]]) over the per-doc sorted
    * shingle-set arrays — the SAME cached sets table the exact verify
    * builds — bit-for-bit equal to the pre-r10 formulation of
    * bands×rowsPerBand separate `min(xxhash64(p, s64))` aggregates
    * followed by `xxhash64(m_i..m_j)` per band (so persisted LSH dedup
    * state interoperates; DedupSpec's parity test pins it). That
    * aggregate shape paid a second full shuffle of the shingle index
    * beside the sets groupBy; this one is map-side over the shared
    * cache (q27 4.4 → 1.2 s, q77 build 5.5 → 1.0 s at sf0.1).
    *
    * Why not a per-row nested-transform over a shingle-array column
    * built inline? Catalyst's project collapsing inlines the
    * shingle-building expression (which contains a quadratic
    * array_distinct) into every one of the 64 permutation lambdas,
    * re-evaluating it 64× per row — measured 520+ s at sf0.1. The
    * cached sets table sidesteps that: the array is materialized once,
    * and the expression loops over it in generated Java.
    *
    * xxhash64 (not md5): signatures only drive candidate generation — the
    * exact-Jaccard verify defines the output — so only within-Spark
    * determinism is needed, and xxhash64 is codegen-native.
    */
  private def bandedSignatures(sets: DataFrame, bands: Int,
      rowsPerBand: Int): DataFrame = {
    import sets.sparkSession.implicits._
    // One native expression (functions.MinhashBands) over the per-doc
    // sorted set arrays — since r18 the CACHED FORM of the shingle index
    // itself ([[shingleArrays]]), so signatures are map-side over the
    // shared cache with no aggregate anywhere in the subtree (the pre-r10
    // formulation paid bands×rowsPerBand min(xxhash64) aggregates; the
    // r10–r17 one a collect_list groupBy), bit-for-bit identical output
    // (persisted state interoperates — pinned by DedupSpec's parity
    // test).
    sets.select($"doc_id",
      posexplode(graft.functions.VecExprs.minhashBands(
        $"ss", bands, rowsPerBand)).as(Seq("band", "bh")))
  }

  /** LSH-bucketed near-dup join with exact-Jaccard verification of the
    * candidates. bands × rowsPerBand = signature length. Output schema and
    * (w.h.p.) contents equal [[jaccardNearDups]] at the same threshold —
    * but candidate generation is a single (band, hash) shuffle instead of
    * a full inverted-index join.
    */
  def lshNearDups(docs: DataFrame, minJ: Double, bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    import docs.sparkSession.implicits._
    val sets = shingleArrays(docs)
    val banded = cacheIndex(bandedSignatures(sets, bands, rowsPerBand))
    // Same multiplicity reasoning as the Jaccard join: a pair colliding in
    // k bands is verified k times (broadcast probes) instead of paying a
    // candidate-dedup shuffle; the distinct runs on the verified output.
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    // Exact verify: jaccard on candidate pairs only, directly against
    // the cached per-doc arrays the signatures came from.
    verifyJaccardSets(cand, sets, minJ).distinct()
  }

  /** Corpus-size default for [[nearDupsAdaptive]]'s exact/LSH boundary.
    * Justified from the measured Σdf² growth of the df-cut exact join
    * (TextProbe, bench_r15_sf1 §text_neardup_decades): 1.9 s at 5k docs
    * (sf0.1) but 47.3 s at 500k — the prefix join's work grows with the
    * square of surviving-shingle document frequencies, which scale with
    * the corpus — while the LSH route measures build-dominated ~linear
    * (9.8 s at 500k, 144.7 s at 5M). Interpolating the measured decades
    * puts the wall-clock crossover between 50k and 500k; 100k is the
    * conservative pick — below it the exact join costs at most a few
    * seconds AND carries no miss probability, above it LSH is both
    * faster and exact-on-candidates.
    */
  val defaultExactMaxDocs = 100000L

  /** Bands for the LSH route at a given threshold: the smallest band
    * count (at the verified 4-rows-per-band geometry) whose probability
    * of missing a TRUE pair at j = minJ, (1 − minJ⁴)^b, is ≤ 1e-4 —
    * floored at the measured q27 default (16, miss 5e-8 at j = 0.9) so
    * the high-threshold shape is unchanged, and capped at 256 (1024
    * minhashes): below j ≈ 0.55 the guarantee would need thousands of
    * permutations, and a corpus-scale join at such thresholds is the
    * wrong tool regardless — the pair volume itself is no longer
    * near-dup-sparse.
    */
  private[graft] def minhashBandsFor(minJ: Double): Int = {
    val p = math.pow(math.min(math.max(minJ, 0.05), 0.999), 4)
    val b = math.ceil(math.log(1e-4) / math.log1p(-p)).toInt
    math.min(256, math.max(16, b))
  }

  /** Corpus-size-routed near-dup dispatcher (the
    * [[graft.operators.Reporting.lengthOutliersAdaptive]] pattern
    * applied to the near-dup family): the exact prefix-filtered Jaccard
    * join below `exactMaxDocs` documents, the MinHash-LSH route — with
    * a band count sized for the threshold by [[minhashBandsFor]] —
    * above it. Both legs emit the same (doc_a, doc_b, jaccard) schema
    * with exact Jaccard values (the LSH leg verifies every candidate
    * exactly; only candidate GENERATION is probabilistic, with miss
    * ≤ 1e-4 at the threshold by construction).
    *
    * This encodes in code what was previously doctrine in docs: the
    * exact join's Σdf² term makes it a small/mid-corpus tool (measured
    * 47 s at 500k docs where LSH does the same job in 9.8 s —
    * bench_r15_sf1 §text_neardup_decades), but BELOW the boundary it is
    * both cheaper than the signature build and miss-free. The one count
    * job is memoized per corpus plan.
    */
  def nearDupsAdaptive(docs: DataFrame, minJ: Double,
      maxDf: Long = defaultMaxDf,
      exactMaxDocs: Long = defaultExactMaxDocs): DataFrame = {
    val n = registry.countOnce(docs.select(col("doc_id")))
    if (n <= exactMaxDocs) jaccardNearDups(docs, minJ, maxDf)
    else lshNearDups(docs, minJ, minhashBandsFor(minJ), 4)
  }

  /** Persistable LSH dedup state for a corpus generation: the banded
    * MinHash signature rows (doc_id, band, bh) and the sorted shingle-set
    * arrays (doc_id, ss) — everything [[incrementalNearDups]] needs to
    * dedup future batches against this corpus WITHOUT re-reading its
    * text. Write both as parquet (they are plain columnar rows; ~64
    * longs + one array per doc) and hand them back on the next batch.
    */
  def lshDedupState(docs: DataFrame, bands: Int = 16,
      rowsPerBand: Int = 4): (DataFrame, DataFrame) =
    lshDedupStateFromSets(shingleArrays(docs), bands, rowsPerBand)

  /** [[lshDedupState]] from pre-built (doc_id, s64) shingle rows — the
    * entry point when only an EXPLODED shingle relation exists (e.g.
    * state read back from a row-form layout); pays one collect_list
    * shuffle to rebuild the per-doc arrays. Sessions holding the shared
    * array-form index route through [[lshDedupStateFromSets]] instead,
    * which has no aggregate at all.
    */
  def lshDedupStateFromShingles(sh: DataFrame, bands: Int = 16,
      rowsPerBand: Int = 4): (DataFrame, DataFrame) =
    lshDedupStateFromSets(sortedSets(sh), bands, rowsPerBand)

  /** [[lshDedupState]] from pre-built (doc_id, ss) sorted shingle-set
    * arrays — the shared index's cached form: shingling is
    * per-document, so state over a doc subset is exactly the shared
    * index filtered on doc_id (a map-side filter over the cache), never
    * a re-tokenization of the subset's text. The band table is cached
    * (it feeds two band joins per serve); the sets side is returned
    * as-is — it is either the session cache itself or a map-side filter
    * of it, so a second persist would only duplicate memory.
    */
  def lshDedupStateFromSets(sets: DataFrame, bands: Int = 16,
      rowsPerBand: Int = 4): (DataFrame, DataFrame) =
    (cacheIndex(bandedSignatures(sets, bands, rowsPerBand)), sets)

  /** Incremental near-dup: all pairs with exact Jaccard >= minJ that
    * involve the arriving batch — the same pair CONTENTS as
    * [[lshNearDups]] over the grown corpus restricted to pairs touching
    * the batch, without recomputing anything for the old corpus.
    * Orientation: old–new pairs come out as (doc_a = state doc, doc_b =
    * batch doc) regardless of id order — doc_a is the survivor side;
    * new–new pairs order by id. Normalize to (min, max) before comparing
    * with a full-corpus run if ids interleave across generations.
    *
    * This is the corpus-growth shape at 100 TB: per batch, signature
    * work is O(batch); the old corpus contributes only its compact state
    * rows. The state-side band join shuffles on (band, bh) — and when
    * the batch is small relative to the corpus (the steady-state case)
    * AQE broadcasts the batch's band rows so the state never moves.
    * Exact verification touches only the docs that appear in candidate
    * pairs. Requires the same (bands, rowsPerBand) the state was built
    * with — band hashes are per-doc, so incremental candidates equal the
    * full run's candidates restricted to the batch.
    *
    * Long-running streams: each batch's shingle/signature builds persist
    * in the shared index registry — call [[releaseIndexes]] after the
    * batch's outputs are written, or storage grows per micro-batch.
    */
  def incrementalNearDups(stateBands: DataFrame, stateSets: DataFrame,
      newDocs: DataFrame, minJ: Double, bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame =
    incrementalNearDupsFromSets(stateBands, stateSets,
      shingleArrays(newDocs), minJ, bands, rowsPerBand)

  /** [[incrementalNearDups]] from the batch's pre-built shingle rows —
    * see [[lshDedupStateFromShingles]] for when that shape applies.
    */
  def incrementalNearDupsFromShingles(stateBands: DataFrame,
      stateSets: DataFrame, newShingles: DataFrame, minJ: Double,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame =
    incrementalNearDupsFromSets(stateBands, stateSets,
      sortedSets(newShingles), minJ, bands, rowsPerBand)

  /** [[incrementalNearDups]] from the batch's pre-built (doc_id, ss)
    * sorted shingle-set arrays — the shared array-form index filtered to
    * the batch ([[lshDedupStateFromSets]] doctrine).
    */
  def incrementalNearDupsFromSets(stateBands: DataFrame,
      stateSets: DataFrame, newSets0: DataFrame, minJ: Double,
      bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    import newSets0.sparkSession.implicits._
    // The band table arrives cached from the state builder (it feeds
    // two band joins); the sets side is the cache itself (or a map-side
    // filter of it).
    val (newBands, newSets) =
      lshDedupStateFromSets(newSets0, bands, rowsPerBand)
    // Old–new candidates: state id carries as doc_a (the survivor side),
    // batch id as doc_b. The =!= guard keeps an at-least-once replay (a
    // doc present in both state and batch) from emitting (X, X) — which
    // a keep-lowest consumer would read as "X is its own loser".
    // New–new candidates order by id as usual.
    val oldNew = stateBands.as("x").join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val newNew = newBands.as("x").join(newBands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    // A doc_id present in BOTH state and batch is an update (or an
    // at-least-once replay): the batch's shingle set wins, so every pair
    // involving that id verifies against the text the corpus now holds.
    // Anti-join, not dropDuplicates — survivor choice must not depend on
    // partition order. Batch ids are small per micro-batch, so the anti
    // side broadcasts; stale state BAND rows may still nominate candidates
    // from the old signature, which costs an extra exact verify, never a
    // wrong answer.
    // Cached: the verify epilogue joins the set table twice (doc_a and
    // doc_b sides) — one materialized union instead of two.
    val sets = cacheIndex(stateSets.select($"doc_id", $"ss")
      .join(broadcast(newSets.select($"doc_id")), Seq("doc_id"), "left_anti")
      .union(newSets))
    verifyJaccardSets(oldNew.union(newNew), sets, minJ).distinct()
  }

  /** 16-bit SimHash over distinct 3-gram shingles: bit j of the signature
    * is the sign of Σ_shingles ±1 on bit j of the shingle's 60-bit hash.
    *
    * Shingles, not tokens: with a small shared vocabulary every document
    * contains nearly every token, so token-level signatures collapse to
    * one cluster; shingle features keep the signature discriminative.
    * Computed as an explode + 16 conditional sums (same aggregate shape as
    * the minhash signatures — map-side combine, one row per doc out), with
    * md5-derived hashes so the DuckDB oracle mirrors bit-for-bit.
    */
  def simhashes(docs: DataFrame): DataFrame = simhashes(docs, 16)

  /** Width-parametric SimHash: signature bit j is the sign of the ±1 sum
    * over bit j of each distinct shingle's 60-bit hash, for j < bits
    * (bits ≤ 60 — the shingle hash is the bit source, so the hash width
    * is the signature ceiling).
    *
    * Why widths matter at serve scale (measured, GateProbe r13): a 16-bit
    * space holds 2¹⁶ signatures, and at maxDist ≤ 3 each signature has
    * ~697 hamming neighbors — by ~5k stored docs EVERY novel document
    * collides with something, and the tier stops discriminating. The
    * reference's 16-bit shape (image near-dup over small galleries) is a
    * small-corpus tool; a corpus-scale serve tier needs the 60-bit form,
    * where the same neighbor ball covers 2⁻⁴⁴ of the space. Same
    * aggregate shape at any width: explode + `bits` conditional sums,
    * map-side combined, one row per doc out.
    */
  def simhashes(docs: DataFrame, bits: Int): DataFrame = {
    import docs.sparkSession.implicits._
    require(bits >= 1 && bits <= 60, s"simhash width must be in [1, 60], got $bits")
    // The shared index IS the bit source: its keys are hash60 of the
    // shingle text, exactly what the oracle computes from the strings.
    val sh = shingleRows(docs)
    val h = $"s64"
    // Popcount arithmetic instead of a ±1 CASE per bit: Σ±1 over a group
    // of n rows is 2·Σbit − n, so "Σ±1 > 0" ⟺ "2·Σbit > n" exactly (all
    // integers). The update expression per (row, bit) drops from a
    // branching CASE WHEN to shift-and-add — measured 4.4× on the warm
    // 60-bit aggregate at sf0.1 (0.996 → 0.226 s) with a visibly smaller
    // generated class (faster first-run codegen/JIT too). One extra
    // count(1) column rides the same aggregate.
    val bitSums = (0 until bits).map { j =>
      sum(shiftright(h, j).bitwiseAND(lit(1L))).as(s"b$j")
    }
    sh.groupBy($"doc_id")
      .agg(bitSums.head, (bitSums.tail :+ count(lit(1L)).as("_n")): _*)
      .select($"doc_id",
        (0 until bits).map(j =>
          when(col(s"b$j") * 2L > $"_n", lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Hamming-adjacent SimHash pairs (near-dup at the signature level):
    * all doc pairs whose simhashes differ in ≤ maxDist bits, at the
    * 16-bit reference-parity width (q28/q47's shape).
    *
    * CORPUS-SCALE CALLERS: 16 bits saturate at ~5k docs (every novel
    * signature has a ≤3-bit neighbor once n·ball approaches 2¹⁶ — the
    * measured GateProbe failure); route through the width-parametric
    * overload at 60 bits with a width-scaled maxDist (≈ bits·3/16, the
    * q101/q102 geometry), or take the whole policy from
    * [[graft.operators.IngestGate.simhashParams]].
    */
  def simhashNearPairs(docs: DataFrame, maxDist: Int): DataFrame =
    simhashNearPairs(docs, maxDist, bits = 16)

  /** [[simhashNearPairs]] at an explicit signature width (bits ≤ 60 —
    * the shingle hash is the bit source). Exact without an O(n²)
    * self-join via multi-index hamming blocking — see
    * [[hammingNearPairs]].
    */
  def simhashNearPairs(docs: DataFrame, maxDist: Int, bits: Int): DataFrame =
    hammingNearPairs(simhashes(docs, bits), "doc_id", "simhash", bits, maxDist)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))

  /** Generic exact hamming-≤maxDist pair join over any (id, signature)
    * relation — 16-bit text simhashes and 64-bit image aHashes
    * ([[graft.stages.ImageStage.aHashStage]]) alike, which makes image
    * near-dup the same operator as text near-dup.
    *
    * Exact without an O(n²) self-join: multi-index hamming search
    * (Norouzi, Punjani & Fleet, "Fast Search in Hamming Space with
    * Multi-Index Hashing", CVPR 2012). Split the signature into c
    * chunks; by the GENERALIZED pigeonhole, a pair within maxDist
    * agrees within r = ⌊maxDist/c⌋ on at least one chunk (if every
    * chunk disagreed by ≥ r+1, the total would be ≥ c·(r+1) > maxDist).
    * The index side emits each chunk's exact value; the probe side
    * enumerates, per chunk, every value within hamming radius r of its
    * own (a driver-built xor-mask list — Σ_{i≤r} C(width, i) masks);
    * candidates join on (chunk, value) and are verified exactly with
    * bit_count(xor), so false positives are impossible at any geometry.
    *
    * Why not the naive c = maxDist+1 / r = 0 split (this operator's
    * r12–r14 shape): at wide-signature geometries (60 bits, maxDist
    * 5–11) it degenerates to 5–10-bit chunks whose 2⁵–2¹⁰-value key
    * space makes the candidate join quadratic in n with a constant
    * barely under brute force (~0.2–0.4·n² at 60/11). Fewer, WIDER
    * chunks trade a bounded probe-side fan-out (c·ball rows per doc)
    * for an exponentially more selective join key; [[mihChunks]] picks
    * c from the measured corpus size by exactly that cost model, and
    * recovers the r=0 split automatically where it IS optimal (narrow
    * widths, tiny corpora). The only shuffle is still on (chunk, value)
    * keys; candidate volume is tunable so 2^width ≫ n/bucket.
    */
  def hammingNearPairs(sigs: DataFrame, idCol: String, sigCol: String,
      bits: Int, maxDist: Int): DataFrame = {
    val s = cacheIndex(
      sigs.select(col(idCol).as("_id"), col(sigCol).as("_sig")))
    // Memoized per canonical plan: sibling queries over the same
    // signature frame (q101/q102/q104 share one) pay one count job, and
    // a replayed plan construction (Flow resume) pays none.
    val n = registry.countOnce(s)
    hammingNearPairsWithChunks(s, bits, maxDist,
      mihChunks(bits, maxDist, n, mihBroadcastRows(sigs.sparkSession)), n)
  }

  /** [[hammingNearPairs]] at an explicit chunk count — the spec's
    * geometry sweep (every c in 1..maxDist+1 must return the same pair
    * set) and the probe's old-vs-new comparison hook. `sigs` must
    * already be in (_id, _sig) shape; `n` is its row count (drives the
    * join-strategy choice, not correctness).
    */
  private[graft] def hammingNearPairsWithChunks(sigs: DataFrame,
      bits: Int, maxDist: Int, chunks: Int, n: Long = -1L): DataFrame = {
    import sigs.sparkSession.implicits._
    val exact = indexSide(
      packedCv(chunkSigs(sigs, bits, maxDist, chunks), chunks),
      if (n < 0) sigs.count() else n, chunks,
      mihBroadcastRows(sigs.sparkSession))
    val probe = packedCv(chunkProbes(sigs, bits, maxDist, chunks), chunks)
    exact.as("x").join(probe.as("y"),
        col("x.cv") === col("y.cv") && col("x._id") < col("y._id"))
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"),
        bit_count(col("x._sig").bitwiseXOR(col("y._sig"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter($"hamming" <= maxDist)
  }

  /** (_id, _sig, c, v) → (_id, _sig, cv) with the (chunk, value) key
    * packed into ONE long — both MIH joins key on `cv` so the hash
    * build is a `LongHashedRelation` (dense long-keyed map, one probe
    * per row) instead of a generic row-keyed relation, and the shuffled
    * row drops a slot (32-byte UnsafeRow, was 40). Safe by the chunk
    * geometry: chunks ≥ 2 bounds every chunk width at 33 bits (the last
    * chunk absorbs bits − ⌊bits/c⌋·(c−1) ≤ 33 for bits ≤ 64), so v sits
    * far below bit 48 and the chunk index (< 64) far below the sign
    * bit — the same packing [[chunkProbes]] uses for its mask table. A
    * single chunk has a constant c and v may use all 64 bits, so cv is
    * just v.
    */
  private[graft] def packedCv(chunked: DataFrame, chunks: Int): DataFrame = {
    val cv =
      if (chunks == 1) col("v")
      else shiftleft(col("c").cast("long"), 48).bitwiseOR(col("v"))
    chunked.select(col("_id"), col("_sig"), cv.as("cv"))
  }

  /** Join-strategy control for the MIH index side — the probe side is
    * always the bigger relation (c·ball rows per doc vs c), so the
    * index side is the build side, and the one decision that matters
    * at scale is HOW it builds (measured, bench_r15_sf1.json
    * §mih_hamming): small index → broadcast (map-side join, the probe
    * fan-out never shuffles — MIH 3.9 s vs 15.4 s at 500k docs); big
    * index → SHUFFLE_HASH hint, because the default sort-merge SORTS
    * the multi-hundred-million-row probe side, which dominated the
    * whole join at 5M docs (65 s, vs 42 s for the r=0 split that MIH
    * should beat) — a hash build per partition needs no sort on
    * either side.
    *
    * The broadcast cutoff is the session's byte budget
    * ([[mihBroadcastRows]]), not a hard-coded row count (r15 advice):
    * the r15 constant (4M rows ≈ 192 MB of hash relation) was tuned on
    * a 128 GiB local host and would pressure executor memory on a real
    * cluster; the budget now rides on
    * `spark.sql.autoBroadcastJoinThreshold` (override:
    * `spark.graft.mih.broadcastBytes`) so the cluster's own memory
    * policy decides the regime.
    */
  private def indexSide(exact: DataFrame, n: Long, chunks: Int,
      bcastRows: Long): DataFrame =
    if (n * chunks <= bcastRows) broadcast(exact)
    else exact.hint("shuffle_hash")

  /** Broadcast budget for the MIH joins, in hash-relation ROWS: the
    * session's byte budget over the ~48-byte footprint of one
    * (_id, _sig, c, v) UnsafeRow in a broadcast hash relation (8-byte
    * null bitmap + four 8-byte slots + relation overhead). The budget
    * is `spark.graft.mih.broadcastBytes` when set — the knob for scale
    * probes on big-memory hosts, where a few hundred MB of broadcast
    * index side measured 2.6–3.9× faster than the shuffled join
    * (bench_r15_sf1 §mih_hamming 500k leg) without touching every
    * OTHER join's broadcast policy — else
    * `spark.sql.autoBroadcastJoinThreshold`, so an un-tuned session
    * inherits exactly the memory budget the cluster operator already
    * declared for broadcast relations. A non-positive budget (e.g.
    * autoBroadcastJoinThreshold = -1, broadcasts disabled) routes every
    * MIH join to the shuffled-hash regime.
    */
  private[graft] def mihBroadcastRows(spark: SparkSession): Long = {
    val s = spark.conf.getOption("spark.graft.mih.broadcastBytes")
      .orElse(spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
      .getOrElse("10m").trim
    val bytes =
      if (s.startsWith("-")) 0L
      else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
    bytes / 48L
  }

  /** MIH chunk-count selection from (signature width, radius, corpus
    * size): minimize per-doc work = probe fan-out (c·ball rows, cost-
    * weighted by HOW the join moves them) plus expected in-join verify
    * candidates (c·ball·n/2^width under the uniform-signature model —
    * conservative on real corpora, where near-dup signatures cluster)
    * over c ∈ 1..maxDist+1, capping the driver-built mask list at 8192
    * entries. The optimum tracks 2^width ≈ n (Norouzi's b/log₂n
    * substring rule): 60/5 picks 3×20-bit chunks at n=60k (r=1,
    * 21-mask ball — ~90× fewer candidates than the r=0 split) but
    * keeps maxDist+1 chunks at n≲100, where enumeration would cost
    * more than it saves.
    *
    * The row weight is regime-dependent (measured, bench_r15_sf1.json
    * §mih_hamming): while the index side broadcasts (c·n ≤ `bcastRows`,
    * the same session budget [[indexSide]] applies — callers pass
    * [[mihBroadcastRows]] so the model prices the join the planner will
    * actually build) probe rows never shuffle and cost about
    * one in-join eval; once the join shuffles, a probe row costs ~30
    * evals (90 ns/row vs the measured ~2G in-join evals/s at 5M docs).
    * Without the weight the model flips to wide 2-chunk geometries
    * past ~20M docs, whose 900+-row per-doc fan-out (46G shuffled rows
    * at 50M) costs far more than the candidate evals it saves. The
    * weight itself is scale-dependent and conservative: the r16 50M
    * measurement (bench_r16_sf1 §mih_hamming_50M) puts the effective
    * per-shuffled-row cost nearer ~300 evals once the shuffle outgrows
    * page-cache-friendly spills (~1 µs/row at 3.15G rows/53 GB on one
    * local disk) — the GEOMETRY pick is unchanged by the 10× (c=3
    * still beats c=2's 932-mask fan-out and c=4's 2¹⁵ key space by
    * >10× under either weight; the candidate model itself measured
    * exact to 0.01% at 50M), so the model keeps the 5M-fitted weight
    * rather than a host-disk-specific one. Pure
    * function of its arguments, so plans stay deterministic at a given
    * corpus size; the default budget is the measured local[32] value
    * (4M rows ≈ 192 MB).
    */
  private[graft] def mihChunks(bits: Int, maxDist: Int, n: Long,
      bcastRows: Long = 4_000_000L): Int = {
    def ball(w: Int, r: Int): Double = {
      var total = 0.0; var c = 1.0
      for (i <- 0 to r) { total += c; c = c * (w - i) / (i + 1) }
      total
    }
    val nd = math.max(1L, n).toDouble
    var best = maxDist + 1
    var bestCost = Double.MaxValue
    for (c <- 1 to math.min(bits, maxDist + 1)) {
      val r = maxDist / c
      // Ball/cost per ACTUAL chunk width: when c doesn't divide bits the
      // last chunk absorbs the remainder and its ball is the largest, so
      // the min-width approximation both under-prices the fan-out and —
      // the real bug — let the driver-built mask list overshoot the 8192
      // cap (ball grows ~(w'/w)^r for the wider last chunk). The cap now
      // bounds the widest chunk's real xorMasks size; fanOut/cands sum
      // the exact per-chunk terms chunkProbes will build.
      val balls = (0 until c).map(i => ball(chunkWidth(bits, c, i), r))
      val fanOut = balls.sum
      val cands = (0 until c).map(i =>
        balls(i) * nd / math.pow(2.0, chunkWidth(bits, c, i).toDouble)).sum
      val rowW = if (c * nd <= bcastRows.toDouble) 1.0 else 30.0
      val cost = rowW * fanOut + cands
      if (balls.max <= 8192 && cost < bestCost) { bestCost = cost; best = c }
    }
    best
  }

  /** Every xor-mask over `width` low bits with popcount ≤ maxPop, i.e.
    * the hamming ball of radius maxPop around 0 — the probe side's
    * per-chunk enumeration table. Driver-built once per plan; size
    * Σ_{i≤maxPop} C(width, i), capped by [[mihChunks]]' geometry
    * choice.
    */
  private[graft] def xorMasks(width: Int, maxPop: Int): Seq[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    def rec(bit: Int, mask: Long, pop: Int): Unit = {
      buf += mask
      if (pop < maxPop) {
        var b = bit
        while (b < width) { rec(b + 1, mask | (1L << b), pop + 1); b += 1 }
      }
    }
    rec(0, 0L, 0)
    buf.toSeq
  }

  private def chunkWidth(bits: Int, chunks: Int, c: Int): Int = {
    val bitsPer = bits / chunks
    // The last chunk absorbs the remainder bits when chunks doesn't
    // divide the width — otherwise the top bits would belong to no chunk
    // and pairs differing only there would be silently missed.
    if (c == chunks - 1) bits - bitsPer * (chunks - 1) else bitsPer
  }

  private def chunkVal(sig: Column, bits: Int, chunks: Int, c: Int): Column = {
    val width = chunkWidth(bits, chunks, c)
    val mask = if (width == 64) -1L else (1L << width) - 1
    shiftright(sig, c * (bits / chunks)).bitwiseAND(lit(mask))
  }

  /** Index side: (_id, _sig) → one row per chunk with its EXACT value:
    * (_id, _sig, c, v). This is the stored/persisted/cached side of
    * both MIH joins — it never fans out beyond `chunks` rows per doc.
    */
  private[graft] def chunkSigs(sigs: DataFrame, bits: Int, maxDist: Int,
      chunks: Int): DataFrame = {
    import sigs.sparkSession.implicits._
    require(bits >= 1 && bits <= 64 && maxDist < bits,
      s"need 1 <= bits <= 64 and maxDist < bits, got ($bits, $maxDist)")
    require(chunks >= 1 && chunks <= bits,
      s"need 1 <= chunks <= bits, got ($chunks, $bits)")
    val chunkArr = array((0 until chunks).map { c =>
      struct(lit(c).as("c"), chunkVal(col("_sig"), bits, chunks, c).as("v"))
    }: _*)
    sigs.select($"_id", $"_sig", explode(chunkArr).as("ch"))
      .select($"_id", $"_sig", col("ch.c").as("c"), col("ch.v").as("v"))
  }

  /** Probe side: (_id, _sig) → one row per (chunk, ball value): every
    * value within radius ⌊maxDist/chunks⌋ of the doc's own chunk value,
    * generated by xor against the driver-built mask table (one literal
    * PRIMITIVE long array — chunk index packed into the high bits so
    * the explode stays a codegen-friendly array<bigint>, not an array
    * of structs — one explode, all map-side). At chunks = maxDist+1
    * the radius is 0 and this degenerates to [[chunkSigs]] exactly.
    */
  private[graft] def chunkProbes(sigs: DataFrame, bits: Int, maxDist: Int,
      chunks: Int): DataFrame = {
    import sigs.sparkSession.implicits._
    val r = maxDist / chunks
    // (c << 48) | mask: with chunks ≥ 2 every chunk is ≤ 32 bits wide
    // (bits ≤ 64), so masks sit far below bit 48 and the chunk index
    // (≤ 64) far below the sign bit; chunks == 1 has a constant chunk
    // index and the mask may use all 64 bits, so it skips the packing.
    val single = chunks == 1
    val packed: Seq[Long] = (0 until chunks).flatMap { c =>
      xorMasks(chunkWidth(bits, chunks, c), r)
        .map(m => if (single) m else (c.toLong << 48) | m)
    }
    val cCol =
      if (single) lit(0) else shiftrightunsigned($"cm", 48).cast("int")
    val maskCol =
      if (single) $"cm" else $"cm".bitwiseAND(lit((1L << 48) - 1))
    val ownVal = coalesce((0 until chunks).map { c =>
      when(cCol === c, chunkVal(col("_sig"), bits, chunks, c))
    }: _*)
    sigs.select($"_id", $"_sig", explode(typedlit(packed)).as("cm"))
      .select($"_id", $"_sig", cCol.as("c"),
        ownVal.bitwiseXOR(maskCol).as("v"))
  }

  /** Raw candidate volume of [[hammingNearPairsWithChunks]] — the
    * number of (x, y) join matches the verify step would see — WITHOUT
    * running the join. Chunk-match is symmetric (v_x ∈ ball_r(v_y) ⇔
    * v_y ∈ ball_r(v_x)) and a doc matches itself in exactly one probe
    * row per chunk (the mask-0 entry), so with M = Σ_{(c,v)}
    * idxCnt(c,v)·probeCnt(c,v) the ordered `x._id < y._id` count is
    * exactly (M − chunks·n) / 2. The two groupBys partial-aggregate
    * map-side, so the shuffle is bounded by distinct (c, v) keys
    * (≤ chunks·2^chunkWidth), not the c·ball·n probe fan-out — at the
    * 50M-signature decade this is the difference between a ~50 GB
    * shuffle pass and a ~200 MB one (the join-based count plus the
    * timed join overflowed local disk). `OperatorsSpec` pins equality
    * with the materialized join's count across geometries.
    */
  private[graft] def hammingCandidateCount(sigs: DataFrame, bits: Int,
      maxDist: Int, chunks: Int): Long = {
    val n = sigs.count()
    val idx = chunkSigs(sigs, bits, maxDist, chunks)
      .groupBy("c", "v").agg(count("*").as("xc"))
    val prb = chunkProbes(sigs, bits, maxDist, chunks)
      .groupBy("c", "v").agg(count("*").as("yc"))
    val m = idx.join(prb, Seq("c", "v"))
      .agg(sum(col("xc") * col("yc"))).head().getLong(0)
    (m - chunks * n) / 2
  }

  /** Hamming-≤maxDist pairs of an INCOMING batch against a stored
    * signature state — the serving-side form of [[hammingNearPairs]],
    * same MIH blocking but two-sided: the state holds the exact chunk
    * index (the persisted/cached side), the batch's enumerated probe
    * rows broadcast against it. Emits ordered (id, dup_of, hamming) —
    * id from the batch, dup_of from the state — so a batch doc reports
    * EVERY stored near-twin.
    *
    * Scale shape: serve-time work is |batch|·c·ball probe rows joined
    * map-side against the chunked state (broadcast the batch, never the
    * state); the chunk geometry derives from the STATE's size — the
    * side whose candidate volume the key selectivity must control —
    * and exactness is the generalized pigeonhole bound, verified with
    * bit_count(xor).
    */
  def hammingNearPairsAgainst(state: DataFrame, batch: DataFrame,
      idCol: String, sigCol: String, bits: Int, maxDist: Int): DataFrame = {
    import state.sparkSession.implicits._
    val bcastRows = mihBroadcastRows(state.sparkSession)
    // State frames are corpus-lifetime (explicitly session-scoped even
    // when a caller wraps the whole serve in batchScope) and their
    // count is memoized per canonical plan: a serve loop probing the
    // same state every micro-batch counts it once, not once per batch.
    val st = registry.cache(
      state.select(col(idCol).as("_id"), col(sigCol).as("_sig")))
    val chunks = mihChunks(bits, maxDist, registry.countOnce(st), bcastRows)
    // The CHUNKED index is what every batch scans — cache it packed
    // (not just the raw signatures) so steady-state serve is a columnar
    // scan + one long-key hash probe per chunk row, not a per-batch
    // re-explode of the whole state (the r16 50M finding: the explode
    // plus generic (c, v)-keyed probe put the 200-doc batch at 13.4 s).
    val stChunks = registry.cache(
      packedCv(chunkSigs(st, bits, maxDist, chunks), chunks))
    // Batch frames are batch-lifetime — scoped so the serve loop can
    // evict them per micro-batch (releaseBatchIndexes) instead of
    // accreting one persisted signature frame per served batch.
    val b = batchScope(cacheIndex(
      batch.select(col(idCol).as("_id"), col(sigCol).as("_sig"))))
    val bt = packedCv(chunkProbes(b, bits, maxDist, chunks), chunks)
    // Per-micro-batch serve broadcasts the batch's probe fan-out (the
    // state never moves); a BACKFILL-sized batch whose fan-out exceeds
    // the broadcast budget degrades to a shuffled hash join instead —
    // build still on the batch side, and nothing is ever sorted.
    val r = maxDist / chunks
    val fanOut = b.count() * (0 until chunks)
      .map(c => xorMasks(chunkWidth(bits, chunks, c), r).size.toLong).sum
    val probeSide =
      if (fanOut <= bcastRows) broadcast(bt) else bt.hint("shuffle_hash")
    stChunks.as("x").join(probeSide.as("y"),
        col("x.cv") === col("y.cv") && col("x._id") =!= col("y._id"))
      .select(col("y._id").as("id"), col("x._id").as("dup_of"),
        bit_count(col("x._sig").bitwiseXOR(col("y._sig"))).cast("long")
          .as("hamming"))
      .distinct()
      .filter($"hamming" <= maxDist)
  }

  /** Serving-side SimHash near-dup (q96): an incoming document batch
    * signed with [[simhashes]] and probed against a stored signature
    * state — the per-batch ingest dedup, the SimHash counterpart of
    * q77's LSH serve half and q95's embedding serve. A signature is a
    * pure function of its own document (no corpus-df dependence), so
    * batch-local signing is exact, and the pigeonhole join is exact at
    * the signature level — the whole serve path carries a brute-force
    * DuckDB oracle like q47.
    */
  def simhashNearDupsFromState(state: DataFrame, batchDocs: DataFrame,
      maxDist: Int, bits: Int = 16): DataFrame =
    // Batch signing builds batch-lifetime shingle/signature caches —
    // scope them for per-micro-batch eviction (releaseBatchIndexes).
    hammingNearPairsAgainst(state, batchScope(simhashes(batchDocs, bits)),
      "doc_id", "simhash", bits, maxDist)
      .select(col("id").as("doc_id"), col("dup_of"), col("hamming"))

  /** Diagnostic: banded-candidate count for the default LSH config. */
  def lshCandidateCount(docs: DataFrame): Long = {
    import docs.sparkSession.implicits._
    val banded = cacheIndex(bandedSignatures(shingleArrays(docs), 16, 4))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
  }

  /** Near-duplicate clusters: connected components over the exact-Jaccard
    * pair graph, labeled by the component's minimum doc_id, plus cluster
    * size and the keep-one-survivor flag — the step that turns near-dup
    * PAIRS into an actual deduplicated corpus.
    *
    * Algorithm: iterative min-label propagation to a fixpoint (each round
    * is one join + one aggregate; rounds = max in-cluster distance to the
    * minimum node). Near-dup clusters are overwhelmingly tiny — the giant
    * components of web dedup come from exact dups, removed earlier — so
    * convergence is a handful of rounds; at extreme scale swap the loop
    * body for the large-star/small-star steps (same join/agg primitives,
    * O(log n) rounds). Deterministic: min over a set, no tie ambiguity.
    */
  def nearDupClusters(docs: DataFrame, minJ: Double,
      unionFindMaxEdges: Long = 2_000_000,
      maxDf: Long = defaultMaxDf): DataFrame = {
    import docs.sparkSession.implicits._
    // Same stop-shingle default as the pair query (q26): identical plans
    // mean the verified pair set is built ONCE per session and shared via
    // the index cache — clustering over a corpus whose pairs were already
    // queried costs one collect, not a second inverted-index join.
    val pairs = jaccardNearDups(docs, minJ, maxDf).select($"doc_a", $"doc_b")
    Clusters.fromPairs(docs.select($"doc_id"), pairs, unionFindMaxEdges,
      registry)
  }

  /** Leakage-safe train/val/test split: membership is a pure function of
    * the near-dup CLUSTER label, not the document id, so near-duplicates
    * can never straddle train and test — the per-document hash split
    * (q62) leaks mutated copies of training documents into the test set,
    * which near-dup clustering exists to catch. Same "split" tag and
    * 0.8/0.9 thresholds as [[Sampling.splitCensus]], and a singleton's
    * cluster label IS its doc_id — so un-duplicated documents keep
    * exactly the split the per-document operator would give them; only
    * clustered documents get coalesced (to the split of their minimum
    * member).
    *
    * Scale shape: the cluster step is [[nearDupClusters]] (banded index,
    * bounded closure — identical plan, so a session that already queried
    * clusters shares the cached labels); the split itself is one
    * map-side hash, no extra shuffle.
    */
  def leakageSafeSplit(docs: DataFrame, minJ: Double,
      maxDf: Long = defaultMaxDf): DataFrame = {
    import docs.sparkSession.implicits._
    val u = detUniform("split", $"cluster_id")
    nearDupClusters(docs, minJ, maxDf = maxDf)
      .select($"doc_id", $"cluster_id")
      .withColumn("split",
        when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test"))
  }

  /** Benchmark decontamination — the standard training-data hygiene pass:
    * for every training document, the number of 3-gram shingles it shares
    * with ANY document of the held-out source, and a contamination flag at
    * `minShared`.
    *
    * Scale shape: eval benchmark sets are small by construction, so the
    * eval shingle set broadcasts; the training side is a map-side
    * semi-join + one groupBy(doc_id) count — the corpus never shuffles on
    * shingle keys. Reuses the session's shared shingle index.
    */
  def decontaminate(docs: DataFrame, evalSource: String,
      minShared: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val sh = shingleRows(docs)
    val evalIds = docs.filter($"source" === evalSource).select($"doc_id")
    val evalShingles = sh.join(broadcast(evalIds), "doc_id")
      .select($"s64").distinct()
    val trainDocs = docs.filter($"source" =!= evalSource).select($"doc_id")
    val shared = sh.join(broadcast(evalIds), Seq("doc_id"), "left_anti")
      .join(broadcast(evalShingles), "s64")
      .groupBy($"doc_id").agg(count(lit(1)).as("n"))
    trainDocs.join(shared, Seq("doc_id"), "left_outer")
      .select($"doc_id",
        coalesce($"n", lit(0L)).as("n_shared"))
      .withColumn("contaminated", $"n_shared" >= minShared)
  }

  /** Keep-first exact dedup on a compound key with deterministic survivor
    * choice (reference D1/D5 keep-first-seen semantics,
    * /root/reference/test_kimono.py:316-356): unlike dropDuplicates, the
    * survivor is total-order defined, so distributed runs are stable.
    */
  def firstEventPerKey(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".asc, $"event_id".asc)
    events.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"user_id", $"event_type", $"event_id".as("first_event_id"),
        unix_micros($"ts").as("first_us"))
  }

  /** Exact-dedup grouping by content fingerprint (reference D2 global
    * hash dedup): survivor id + duplicate count per distinct content.
    */
  def exactDedupGroups(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Cross-document boilerplate contamination (the C4/Gopher-family
    * dup-ngram rule): per document, the fraction of its distinct 3-gram
    * shingles that also occur in at least one OTHER document. Distinct
    * from within-doc repetition (TextAnalysis.repetitionStats measures a
    * doc against itself) and from pairwise similarity (jaccardNearDups
    * finds WHO you overlap with; this measures HOW MUCH of you is
    * corpus-shared — headers, footers, license blocks).
    *
    * Shape: the shared cached shingle index, one df window on s64 (the
    * same partitioning the Jaccard family's cut/prefix window uses), one
    * doc_id hash aggregate with map-side combine. Linear in the index,
    * no joins, no candidate blow-up — safe at any corpus size.
    *
    * Documents shorter than one shingle (< 3 tokens) have no rows in the
    * index and so no row here — same contract as the Jaccard family
    * (they can't be boilerplate they don't contain); left-join the
    * result back to the corpus if the census must list every doc.
    */
  def boilerplateRatio(docs: DataFrame, maxRatio: Double = 0.5): DataFrame = {
    import docs.sparkSession.implicits._
    shingleRows(docs)
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"s64")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when($"df" > 1, 1L).otherwise(0L)).as("n_shared"))
      .select($"doc_id", $"n_shingles", $"n_shared",
        ($"n_shared".cast("double") / $"n_shingles").as("dup_ratio"))
      .withColumn("boilerplate", $"dup_ratio" > maxRatio)
  }

  /** Cross-document EXACT substring dedup (the Lee et al. 2022
    * "Deduplicating Training Data Makes Language Models Better" unit):
    * every k-token window that occurs verbatim in ≥2 distinct documents
    * is a shared span, and each document reports how much of it is made
    * of them. Longer than the 3-gram shingles on purpose — a k=8 window
    * is a memorization-length span, not a phrase — and counted per
    * OCCURRENCE, not per distinct shingle: a doc that repeats a shared
    * license block five times carries five spans of contamination.
    *
    * Spark shape: the same posexplode + element_at window build as
    * [[shingleRows]] (map-side, no lambda-over-split re-evaluation),
    * spans keyed by hash60 so the shuffle moves 8-byte keys instead of
    * k-token strings. One aggregate on h (count-distinct doc_id, two
    * phase with map-side partials), one join back on h to attribute
    * occurrences — both AQE-skew-safe: the popular-span hot keys that
    * make boilerplate boilerplate are exactly what AQE skew handling
    * splits. Docs with < k tokens contribute no spans and no row (the
    * same contract as the shingle family).
    */
  def sharedSpans(docs: DataFrame, k: Int = 8): DataFrame = {
    import docs.sparkSession.implicits._
    val spanCols = col("w") +: (2 to k).map(j =>
      element_at($"toks", $"i" + j))
    val occ = cacheIndex(docs
      .select($"doc_id", split($"text", " ").as("toks"))
      .select($"doc_id", $"toks", posexplode($"toks").as(Seq("i", "w")))
      .filter($"i" <= size($"toks") - k)
      .select($"doc_id", hash60(concat_ws(" ", spanCols: _*)).as("h")))
    val shared = occ.groupBy($"h")
      .agg(countDistinct($"doc_id").as("ndocs"))
      .filter($"ndocs" >= 2)
      .select($"h")
    occ.join(shared, "h")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared"),
        countDistinct($"h").as("n_distinct_shared"))
  }

  type Q = (SparkSession, String) => DataFrame

  /** The q77 corpus-growth boundary: 90% of the id space is the standing
    * corpus, the top 10% is the arriving batch — the steady-state serving
    * ratio (a micro-batch is small against the corpus it dedups into),
    * which is what makes the serve-side bench entry measure batch cost
    * rather than a second corpus build. Scales with the table (one max()
    * driver action); 0 on an empty corpus, so both q77 queries degrade to
    * empty results instead of failing the max read.
    */
  private def batchCut(docs: DataFrame): Long = {
    val r = docs.agg(max(col("doc_id"))).head
    if (r.isNullAt(0)) 0L else (r.getLong(0) + 1) * 9 / 10
  }

  def queries: Map[String, Q] = Map(
    "q76_boilerplate" -> ((s, d) =>
      boilerplateRatio(Tables.load(s, d).documents)),
    "q24_dedup_exact" -> ((s, d) => exactDedupGroups(Tables.load(s, d).documents)),
    "q25_dedup_first_event" -> ((s, d) => firstEventPerKey(Tables.load(s, d).events)),
    "q26_neardup_jaccard" -> ((s, d) =>
      jaccardNearDups(Tables.load(s, d).documents, 0.6, defaultMaxDf)),
    "q27_neardup_lsh" -> ((s, d) => lshNearDups(Tables.load(s, d).documents, 0.9)),
    // The size-routed dispatcher on its exact side (the verify corpus
    // sits far below the 100k boundary): the oracle is the full exact
    // Jaccard answer, which is the dispatcher's contract there. The LSH
    // side's routing is pinned by spec (DedupSpec) — its w.h.p.
    // candidate generation is deliberately not an oracle surface.
    "q107_neardups_adaptive" -> ((s, d) =>
      nearDupsAdaptive(Tables.load(s, d).documents, 0.7)),
    // Corpus-growth scenario on driver data: the lower 90% of the id
    // space is the already-signed corpus (state built once, text never
    // re-read), the top 10% arrives as a batch — see [[batchCut]]; the
    // oracle pins the identical arithmetic.
    // The state-build half of the q77 scenario, benchmarked (and oracled)
    // on its own: per state doc, its distinct-shingle count and band-row
    // count — an action that materializes BOTH cached state tables, so the
    // serve entry below measures steady-state batch cost, not the one-time
    // index build it amortizes in production. Sorts before the serve entry,
    // which is what makes the bench split work.
    // Both q77 halves derive from the session's corpus-wide shingle
    // index: shingling is per-document, so the state side is the index
    // filtered below the cut (map-side over the cache the other near-dup
    // queries already built) — not a re-tokenization of 90% of the
    // corpus text — and the batch side is the complement filter.
    "q77_dedup_state_build" -> ((s, d) => {
      val docs = Tables.load(s, d).documents
      val cut = batchCut(docs)
      val (sb, ss) = lshDedupStateFromSets(
        shingleArrays(docs).filter(col("doc_id") < cut))
      ss.select(col("doc_id"), size(col("ss")).cast("long").as("n_shingles"))
        .join(sb.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bands")), "doc_id")
    }),
    "q77_incremental_neardups" -> ((s, d) => {
      val docs = Tables.load(s, d).documents
      val cut = batchCut(docs)
      val sets = shingleArrays(docs)
      val (sb, ss) = lshDedupStateFromSets(sets.filter(col("doc_id") < cut))
      incrementalNearDupsFromSets(sb, ss,
        sets.filter(col("doc_id") >= cut), 0.9)
    }),
    "q28_simhash" -> ((s, d) => simhashes(Tables.load(s, d).documents)),
    "q47_simhash_pairs" -> ((s, d) =>
      simhashNearPairs(Tables.load(s, d).documents, 1)),
    // Serving-side SimHash dedup: the first 20 docs as the incoming
    // batch, the full corpus's signatures as the stored state.
    "q96_simhash_serve" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d).documents
      simhashNearDupsFromState(simhashes(docs),
        docs.filter($"doc_id" < 20), 1)
    }),
    // Corpus-scale signature width (see [[simhashes]] scale note): the
    // MIH pair join at 60 bits / maxDist 5 — [[mihChunks]] picks the
    // chunk geometry from the corpus size (3×20-bit chunks with radius-1
    // probe balls at sf0.1+), so the join keys stay selective while the
    // neighbor ball shrinks from 2⁻⁶·⁴ of the space (16-bit) to 2⁻³⁸
    // (60-bit).
    "q101_simhash_wide_pairs" -> ((s, d) =>
      hammingNearPairs(simhashes(Tables.load(s, d).documents, 60),
        "doc_id", "simhash", 60, 5)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          col("hamming"))),
    "q102_simhash_wide_serve" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d).documents
      // Wider batch than q96 (200 vs 20): the 60-bit space is selective
      // enough that a 20-doc batch yields ~1 stored near-twin — the
      // larger batch keeps the compare substantive at verify scale.
      simhashNearDupsFromState(simhashes(docs, 60),
        docs.filter($"doc_id" < 200), 5, bits = 60)
    }),
    // q101 reached through the SQL table function (GraftExtensions):
    // identical pigeonhole-join operator, macro-expanded at analysis
    // time, so SQL-first users get corpus-scale near-dup pairs without
    // a line of Scala.
    "q104_sql_simhash_pairs" -> ((s, d) => {
      graft.GraftExtensions.register(s)
      Tables.load(s, d).documents.createOrReplaceTempView("documents_v")
      s.sql(
        "SELECT doc_a, doc_b, hamming FROM simhash_near_pairs('documents_v', 5, 60)")
    }),
    "q64_decontaminate" -> ((s, d) =>
      decontaminate(Tables.load(s, d).documents, "src0", 5)),
    "q67_neardup_clusters" -> ((s, d) =>
      nearDupClusters(Tables.load(s, d).documents, 0.6)),
    // Same minJ as q67 ON PURPOSE: the cluster plan is identical, so in
    // a shared session the split rides q67's cached labels and pair set.
    "q83_leakage_safe_split" -> ((s, d) =>
      leakageSafeSplit(Tables.load(s, d).documents, 0.6)),
    "q88_shared_spans" -> ((s, d) =>
      sharedSpans(Tables.load(s, d).documents)),
    "q91_containment" -> ((s, d) =>
      containmentDups(Tables.load(s, d).documents, 0.8))
  )

  private[operators] val shingleCte =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
      |         generate_subscripts(string_split(text,' '), 1) AS i
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
      |  FROM tok a
      |  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
      |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY x.doc_id, y.doc_id)""".stripMargin

  private def jaccardSql(minJ: Double): String = jaccardSql(minJ, shingleCte)

  /** Shingle CTE with the stop-shingle df cut applied before sizes and
    * intersections — the SQL mirror of the bounded
    * [[jaccardNearDups(docs:*]] overload: Jaccard over informative
    * shingles only, with documents re-sized after the cut.
    */
  private def shingleCteCut(maxDf: Long): String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
      |         generate_subscripts(string_split(text,' '), 1) AS i
      |  FROM documents),
      |sh0 AS (
      |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
      |  FROM tok a
      |  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
      |sh AS (
      |  SELECT doc_id, s FROM sh0
      |  WHERE s IN (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= MAXDF)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS c
      |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      |  GROUP BY x.doc_id, y.doc_id)""".stripMargin
      .replace("MAXDF", maxDf.toString)

  private def jaccardSql(minJ: Double, cte: String): String =
    s"""$cte
       |SELECT doc_a, doc_b,
       |  CAST(c AS DOUBLE) / (na.n + nb.n - c) AS jaccard
       |FROM inter
       |JOIN sizes na ON doc_a = na.doc_id
       |JOIN sizes nb ON doc_b = nb.doc_id
       |WHERE CAST(c AS DOUBLE) / (na.n + nb.n - c) >= CAST($minJ AS DOUBLE)""".stripMargin

  /** Shared CTE chain ending in lbl(doc_id, cluster_id): the near-dup
    * pair graph at minJ=0.6 / the default stop-shingle cut (mirroring
    * [[nearDupClusters]]' defaults), transitively closed by recursive
    * CTE with min-reachable label per node — the oracle core of q67 and
    * q83.
    */
  private def clusterLblCte: String =
    s"""${shingleCteCut(defaultMaxDf)
           .replaceFirst("WITH tok", "WITH RECURSIVE tok")},
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    CAST(c AS DOUBLE) / (na.n + nb.n - c) AS j
       |  FROM inter
       |  JOIN sizes na ON doc_a = na.doc_id
       |  JOIN sizes nb ON doc_b = nb.doc_id),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs WHERE j >= CAST(0.6 AS DOUBLE)
       |  UNION ALL
       |  SELECT doc_b, doc_a FROM pairs WHERE j >= CAST(0.6 AS DOUBLE)),
       |reach AS (
       |  SELECT doc_id AS node, doc_id AS peer FROM documents
       |  UNION
       |  SELECT r.node, e.dst FROM reach r JOIN edges e ON r.peer = e.src),
       |lbl AS (SELECT node AS doc_id, MIN(peer) AS cluster_id
       |        FROM reach GROUP BY node)""".stripMargin

  /** Shared CTE chain ending in sig(doc_id, simhash), mirroring
    * [[simhashes]] (shingle features, md5-derived bit hashes).
    */
  private val simhashCte: String = simhashCteAt(16)

  private[operators] def simhashCteAt(width: Int): String = {
    val h = hash60Sql("s")
    val bitSums = (0 until width).map { j =>
      s"SUM(CASE WHEN (($h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(", ")
    val bits = (0 until width).map(j =>
      s"CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END").mkString(" + ")
    s"""tok AS (
       |  SELECT doc_id, unnest(string_split(text,' ')) AS w,
       |         generate_subscripts(string_split(text,' '), 1) AS i
       |  FROM documents),
       |shx AS (
       |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS s
       |  FROM tok a
       |  JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       |  JOIN tok c ON a.doc_id = c.doc_id AND c.i = a.i + 2),
       |bits AS (SELECT doc_id, $bitSums FROM shx GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM bits)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // Shingles compare as strings vs 60-bit hashes in Spark — same
    // injectivity-over-the-corpus assumption as the Jaccard oracles.
    "q76_boilerplate" ->
      s"""$shingleCte,
         |df AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s)
         |SELECT sh.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |  CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*) AS dup_ratio,
         |  (CAST(SUM(CASE WHEN df.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / COUNT(*)) > CAST(0.5 AS DOUBLE) AS boilerplate
         |FROM sh JOIN df USING (s)
         |GROUP BY sh.doc_id""".stripMargin,
    "q24_dedup_exact" ->
      s"""SELECT ${TextAnalysis.fingerprintSql} AS fp,
         |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY 1""".stripMargin,
    "q25_dedup_first_event" ->
      """SELECT user_id, event_type, first_event_id, first_us FROM (
        |  SELECT user_id, event_type, event_id AS first_event_id,
        |    epoch_ns(ts) // 1000 AS first_us,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC) AS rk
        |  FROM events) WHERE rk = 1""".stripMargin,
    "q26_neardup_jaccard" -> jaccardSql(0.6, shingleCteCut(defaultMaxDf)),
    "q107_neardups_adaptive" -> jaccardSql(0.7, shingleCteCut(defaultMaxDf)),
    // The oracle is the full exact answer (no prefix machinery): prefix
    // filtering is completeness-preserving, so the sets must be equal.
    "q91_containment" ->
      s"""${shingleCteCut(defaultMaxDf)},
         |dirs AS (
         |  SELECT i.doc_a, i.doc_b, CAST(c AS DOUBLE) / na.n AS containment
         |  FROM inter i JOIN sizes na ON i.doc_a = na.doc_id
         |  UNION ALL
         |  SELECT i.doc_b, i.doc_a, CAST(c AS DOUBLE) / nb.n
         |  FROM inter i JOIN sizes nb ON i.doc_b = nb.doc_id)
         |SELECT doc_a, doc_b, containment FROM dirs
         |WHERE containment >= CAST(0.8 AS DOUBLE)""".stripMargin,
    // Brute-force O(n^2) oracle; the Spark side is the pigeonhole-blocked
    // exact search, so the result sets must be identical.
    "q47_simhash_pairs" ->
      s"""WITH $simhashCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 1""".stripMargin,
    // Ordered batch-vs-state pairs: b = the batch (doc_id < 20), a = any
    // stored doc; same brute-force-oracle argument as q47.
    "q96_simhash_serve" ->
      s"""WITH $simhashCte
         |SELECT b.doc_id, a.doc_id AS dup_of,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sig b JOIN sig a ON a.doc_id <> b.doc_id
         |WHERE b.doc_id < 20
         |  AND bit_count(xor(a.simhash, b.simhash)) <= 1""".stripMargin,
    // Same brute-force-oracle arguments as q47/q96 at the 60-bit width.
    "q101_simhash_wide_pairs" ->
      s"""WITH ${simhashCteAt(60)}
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 5""".stripMargin,
    "q102_simhash_wide_serve" ->
      s"""WITH ${simhashCteAt(60)}
         |SELECT b.doc_id, a.doc_id AS dup_of,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sig b JOIN sig a ON a.doc_id <> b.doc_id
         |WHERE b.doc_id < 200
         |  AND bit_count(xor(a.simhash, b.simhash)) <= 5""".stripMargin,
    // q104 is q101 reached through the SQL table function — identical
    // operator, identical brute-force oracle.
    "q104_sql_simhash_pairs" ->
      s"""WITH ${simhashCteAt(60)}
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 5""".stripMargin,
    // The LSH path is exact-verified; at 16×4 bands the candidate recall at
    // j ≥ 0.9 is 1 - (1-j⁴)¹⁶ > 1 - 5e-8, so brute force is the oracle.
    "q27_neardup_lsh" -> jaccardSql(0.9),
    // The full-corpus pair set restricted to pairs involving the batch:
    // doc_a < doc_b always, so doc_b >= cut ⇔ at least one endpoint is a
    // batch doc, with cut = (max(doc_id)+1)/2 exactly as the Spark side
    // computes it. Same brute-force-oracle argument as q27.
    "q77_incremental_neardups" -> (jaccardSql(0.9) +
      "\n  AND doc_b >= (SELECT (MAX(doc_id) + 1) * 9 // 10 FROM documents)"),
    // Per state doc (id below the same 90% corpus cut), its distinct
    // shingle count; band count is structurally bands=16 for every doc
    // that has at least one shingle. Empty corpus: the NULL cut filters
    // every row, matching the engine's cut=0 short-circuit.
    "q77_dedup_state_build" ->
      s"""$shingleCte
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |  CAST(16 AS BIGINT) AS n_bands
         |FROM sh
         |WHERE doc_id < (SELECT (MAX(doc_id) + 1) * 9 // 10 FROM documents)
         |GROUP BY doc_id""".stripMargin,
    "q28_simhash" -> s"WITH $simhashCte SELECT doc_id, simhash FROM sig",
    // Shingles compare as strings here vs 60-bit hashes in Spark — the
    // shared-count equality relies on hash injectivity over the corpus,
    // the same assumption as the Jaccard oracles.
    // Transitive closure by recursive CTE (the graph is the near-dup pair
    // set — tiny at oracle scale), then min-reachable label per node.
    // Same stop-shingle cut as q26 — mirrors nearDupClusters' default.
    "q67_neardup_clusters" ->
      s"""$clusterLblCte,
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |       FROM lbl GROUP BY cluster_id)
         |SELECT l.doc_id, l.cluster_id, sz.cluster_size,
         |  l.doc_id = l.cluster_id AS keep
         |FROM lbl l JOIN sz USING (cluster_id)""".stripMargin,
    // The same lbl closure, split-assigned on the CLUSTER label with the
    // identical detUniform("split", ·) draw q62 uses per-document.
    "q83_leakage_safe_split" -> {
      val u = detUniformSql("split", "cluster_id")
      s"""$clusterLblCte
         |SELECT doc_id, cluster_id,
         |  CASE WHEN $u < CAST(0.8 AS DOUBLE) THEN 'train'
         |       WHEN $u < CAST(0.9 AS DOUBLE) THEN 'val'
         |       ELSE 'test' END AS split
         |FROM lbl""".stripMargin
    },
    // Spans compare by the SAME hash60 both sides (hash60Sql) — unlike
    // the shingle oracles there is no string fallback here, because the
    // Spark side counts occurrences per hashed span and the oracle must
    // group identically.
    "q88_shared_spans" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |occ AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(toks) - 6),
         |      i -> ${hash60Sql("array_to_string(list_slice(toks, i, i + 7), ' ')")})) AS h
         |  FROM t WHERE len(toks) >= 8),
         |shared AS (
         |  SELECT h FROM occ GROUP BY h
         |  HAVING COUNT(DISTINCT doc_id) >= 2)
         |SELECT occ.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared,
         |  CAST(COUNT(DISTINCT occ.h) AS BIGINT) AS n_distinct_shared
         |FROM occ JOIN shared USING (h)
         |GROUP BY occ.doc_id""".stripMargin,
    "q64_decontaminate" ->
      s"""$shingleCte,
         |ev AS (
         |  SELECT DISTINCT s FROM sh
         |  JOIN documents USING (doc_id) WHERE source = 'src0'),
         |tr AS (SELECT doc_id FROM documents WHERE source <> 'src0'),
         |shared AS (
         |  SELECT sh.doc_id, COUNT(*) AS n FROM sh
         |  JOIN ev USING (s)
         |  JOIN tr USING (doc_id)
         |  GROUP BY sh.doc_id)
         |SELECT tr.doc_id,
         |  CAST(COALESCE(n, 0) AS BIGINT) AS n_shared,
         |  COALESCE(n, 0) >= 5 AS contaminated
         |FROM tr LEFT JOIN shared USING (doc_id)""".stripMargin
  )
}
