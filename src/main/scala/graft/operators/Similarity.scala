package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fp._

/** Similarity search over embedding columns: exact (brute-force) cosine
  * top-k as the correctness baseline, and a random-hyperplane-LSH bucketed
  * variant as the 100 TB scale path.
  *
  * Determinism: embeddings are quantized to integer milliunits before any
  * arithmetic (int8/int16 quantization is standard ANN practice). Dot
  * products and norms are then exact integer sums — associative, so
  * partial-aggregate merge order can't change results — and the final
  * cosine is a single deterministic float expression both engines compute
  * identically.
  *
  * Scale notes:
  *  - brute force is O(Q·N·d) with a broadcast of the query set: no
  *    shuffle of the corpus at all, embarrassingly parallel, the right
  *    choice when |Q| is small;
  *  - LSH bucketing shuffles once on the bucket id and only scores within
  *    buckets — sublinear candidate sets at the cost of recall; hyperplanes
  *    are md5-derived so bucketing is reproducible everywhere;
  *  - for an IVF-style index, replace the hash bucketing with k-means
  *    centroid assignment; the bucket-join skeleton is identical.
  */
object Similarity {

  /** Quantize a float-array embedding to integer milliunits. */
  def quantize(embedding: Column): Column =
    transform(embedding, x => round(x * 1000.0, 0).cast("long"))

  private val registry = new graft.CacheRegistry

  /** Unpersist the shared quantized corpus (between corpora in a
    * long-lived session) — see [[graft.CacheRegistry]].
    */
  def releaseIndexes(): Unit = {
    registry.release(); groupMemo.clear()
    trainMemo.clear(); pqTrainMemo.clear()
  }

  /** The ONE quantized-corpus projection every similarity operator shares:
    * (vec_id, v, nsq) with v in integer milliunits. quantize() is an
    * interpreted higher-order transform — computing it once per session
    * instead of once per operator (and once per Lloyd iteration in the
    * IVF path) is the difference between scanning floats repeatedly and
    * reading a compact cached long-array column. CacheManager keys on the
    * canonical plan, so sibling operators over the same corpus share one
    * copy; [[releaseIndexes]] frees it.
    */
  private def quantized(embeddings: DataFrame): DataFrame = {
    import embeddings.sparkSession.implicits._
    registry.cache(embeddings
      .select($"vec_id", quantize($"embedding").as("v"))
      .withColumn("nsq", normSqQ($"v")))
  }

  /** Exact integer dot product of two quantized vectors (native codegen
    * expression — see graft.functions.DotQ for why not a HOF).
    */
  def dotQ(a: Column, b: Column): Column = graft.functions.VecExprs.dotQ(a, b)

  /** Squared L2 norm of a quantized vector. */
  def normSqQ(v: Column): Column = dotQ(v, v)

  /** Shared epilogue of every top-k variant: exact-integer cosine of the
    * joined (qv,qnsq)×(v,nsq) rows, then the rank-deterministic per-query
    * top-k window.
    */
  private def scoreTopK(joined: DataFrame, k: Int): DataFrame = {
    import joined.sparkSession.implicits._
    val scored = joined
      .select($"qid", $"vec_id".as("nid"),
        (dotQ($"qv", $"v").cast("double") /
          sqrt($"qnsq".cast("double")) / sqrt($"nsq".cast("double"))).as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid".asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors (self excluded), rank-deterministic.
    */
  def cosineTopK(embeddings: DataFrame, nQueries: Int, k: Int): DataFrame = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nsq".as("qnsq"))
    scoreTopK(e.join(broadcast(q), $"vec_id" =!= $"qid"), k)
  }

  /** Random-hyperplane LSH signature: bit p = sign of <v, r_p>, with
    * hyperplane components r_p[i] = 2·u(p,i)−1 from md5-derived uniforms.
    * Pure per-row expression.
    *
    * Exact integer arithmetic throughout: r_p[i] = (2·h32 − 2³²)/2³² with
    * integer numerator, so the dot's sign is the sign of an exact integer
    * sum (|v[i]| ≤ ~10⁴ × 2³² × 64 dims < 2⁵³) — associative, so the
    * signature is bit-identical across engines and evaluation orders,
    * which is what lets q38 carry a DuckDB oracle despite being "LSH".
    */
  def lshBucket(v: Column, planes: Int, dims: Int): Column = {
    import org.apache.spark.sql.functions.typedlit
    val bits = (0 until planes).map { p =>
      // The component values depend only on (plane, dim) — evaluate the
      // md5 draws at plan-build time and ship a 64-long literal array.
      // The executor-side work is then ONE native codegen dot product per
      // row, vs the previous interpreted zip_with/aggregate lambda that
      // re-hashed every (row, plane, dim) triple.
      val comps = (0 until dims).map(i =>
        detHash32Local(s"plane$p", i.toString) * 2L - 4294967296L)
      val dotNum = dotQ(v, typedlit(comps))
      when(dotNum >= 0L, lit(1L << p)).otherwise(lit(0L))
    }
    // The literal plane arrays have exactly `dims` components and the dot
    // truncates to the common prefix — a vector of any other length would
    // silently bucket on partial data, so fail loudly. NULL vectors
    // null-propagate (their scored rows filter out downstream) rather
    // than killing the job with a message-less error.
    when(v.isNull, lit(null).cast("long"))
      .when(size(v) === dims, bits.reduce(_ + _))
      .otherwise(raise_error(
        concat(lit(s"lshBucket: expected $dims dims, got "),
          coalesce(size(v).cast("string"), lit("null")))))
  }

  /** LSH-bucketed approximate cosine top-k: score only within the query's
    * bucket. Approximate — recall depends on bucket collision probability —
    * so this is the scale path, not the oracle-matched baseline.
    */
  def cosineTopKLsh(embeddings: DataFrame, nQueries: Int, k: Int,
      planes: Int = 4, dims: Int = 64): DataFrame = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
      .withColumn("bucket", lshBucket($"v", planes, dims))
    val q = e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nsq".as("qnsq"),
        $"bucket".as("qbucket"))
    scoreTopK(e.join(broadcast(q),
      $"bucket" === $"qbucket" && $"vec_id" =!= $"qid"), k)
  }

  /** IVF-style approximate cosine top-k: a coarse k-means quantizer
    * assigns every vector to a centroid list; queries probe their `nprobe`
    * nearest centroids and score only those lists — the standard FAISS-IVF
    * shape (candidate scoring shuffles only on list id).
    *
    * The quantizer is Lloyd iteration in exact integer arithmetic:
    * hash-seeded init (the nlist vectors ranked first by md5), squared-L2
    * assignment via nsq + cnsq − 2·dot over quantized components, and
    * centroid updates floor(Σ/ n) on integer sums. Every step is
    * associative-integer or a single deterministic float op, so the whole
    * index — and therefore the approximate result set — is bit-identical
    * across engines, partitionings and retries, which is what lets an
    * "approximate" ANN query carry a DuckDB oracle. (MLlib KMeans would be
    * the off-the-shelf alternative, but its float accumulation order is
    * partition-dependent — unreproducible outside Spark.)
    *
    * Scale notes: centroids are always ≤ nlist×d longs — they live on the
    * driver and ship to executors as literals (the standard broadcast
    * k-means iteration). Per iteration: map-side assignment (zero
    * shuffle), one aggregate whose shuffle is nlist×(d+1) partials per
    * partition, one ≤nlist-row collect. Seed selection is TakeOrdered on
    * the hash key (rank-K, no global sort); iteration count fixed.
    */
  def cosineTopKIvf(embeddings: DataFrame, nQueries: Int, k: Int,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2,
      trainFrac: Double = 1.0): DataFrame = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
    val cents = trainCentroidsSampled(e, nlist, iters, trainFrac)
    if (cents.isEmpty) {
      // Empty corpus: no centroids to train — return the empty result with
      // the operator's schema instead of failing at construction time.
      return e.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    }
    val assigned = e.withColumn("list_id", assignExpr(cents))
    probeAndScore(assigned, e.filter($"vec_id" < nQueries), cents, k, nprobe)
  }

  /** Broadcast-k-means training (the index-build half of
    * [[cosineTopKIvf]]). Centroids live on the driver as literal arrays
    * (nlist × d longs — trivially small; FAISS coarse quantizers are the
    * same shape). Each Lloyd iteration is map-side assignment (an
    * expression, not a crossJoin+window: zero shuffle) plus ONE aggregate
    * shuffle of nlist×(d+1) partial sums per partition, and a ≤nlist-row
    * collect. All arithmetic is exact-integer, so the index — and the
    * DuckDB oracle replay — is deterministic bit-for-bit.
    */
  /** Hash cap for `trainFrac` as an exact integer bound on the 32-bit
    * draw: the training-set membership test is an INTEGER comparison
    * (detHash32 < frac·2^32), identically replayable in DuckDB, with no
    * float-threshold edge to drift between engines.
    */
  private def trainHashCap(trainFrac: Double): Long =
    (trainFrac * 4294967296.0).toLong

  /** FAISS's max_points_per_centroid (Clustering.cpp defaults): k-means
    * quality saturates around ~256 training points per centroid, so
    * training sets larger than 256·k are subsampled with no measurable
    * recall cost. Exposed as the default `ppc` of every trainer (and
    * [[semanticDedupAt]]'s `subTrainPpc`) so deployments can pin it for
    * reproducibility; the driver-contract corpora (500 vectors) are far
    * below every cap, so the pinned oracles replay uncapped training.
    */
  val trainPointsPerCentroid: Int = 256

  /** Effective training fraction after the points-per-centroid cap:
    * min(trainFrac, ppc·k / n). The membership test stays the single
    * integer hash-cap comparison ([[trainHashCap]]), so a capped
    * training set is exactly as replayable as an explicit trainFrac —
    * the cap only changes WHICH deterministic fraction applies. One
    * count() against the (registry-cached) quantized corpus prices it.
    */
  private def cappedTrainFrac(e: DataFrame, k: Int, trainFrac: Double,
      ppc: Int, knownCount: Option[Long] = None): Double = {
    if (ppc <= 0) return trainFrac
    val budget = ppc.toLong * math.max(1, k)
    // Callers that already hold the row count on the driver (the guard's
    // census sums, for one) pass it — pricing the cap must not launch a
    // count job to learn a number the caller just computed.
    val n = knownCount.getOrElse(e.count())
    if (n <= budget) trainFrac
    else math.min(trainFrac, budget.toDouble / n.toDouble)
  }

  /** Train the coarse quantizer on a deterministic hash-derived subsample
    * of the corpus — the 100 TB index-build shape. Lloyd's cost is
    * iters × |train| × nlist distance evaluations; at full scale the
    * corpus-sized factor must be a bounded sample (FAISS trains IVF coarse
    * quantizers on ~max(10k, 256·nlist) points the same way), while the
    * one assignment pass over ALL points is inherent to building the
    * index. Membership = detHash32("ivftrain", vec_id) < trainFrac·2^32:
    * a pure map-side filter (no rank shuffle), deterministic across
    * retries and engines. If the sample is empty while the corpus is not
    * (tiny corpus × tiny fraction), training silently falls back to the
    * full corpus — the oracle (q80) exercises the non-degenerate regime.
    */
  private def trainCentroidsSampled(e: DataFrame, nlist: Int, iters: Int,
      trainFrac: Double,
      ppc: Int = trainPointsPerCentroid,
      knownN: Option[Long] = None): Seq[(Long, Array[Long])] = {
    require(trainFrac > 0.0 && trainFrac <= 1.0,
      s"trainFrac must be in (0, 1], got $trainFrac")
    // Training is a pure deterministic function of (corpus plan,
    // geometry): hash-derived seeds and sample membership, exact-integer
    // Lloyd updates. Memoize per canonical plan — the countOnce doctrine
    // — so sibling ANN operators over the same session-cached corpus
    // (the flat/IVF/PQ/auto family all coarse-train at the same
    // geometry) pay the iters×scan Lloyd jobs once per session, not
    // once per query. knownN is excluded from the key: it is only the
    // count shortcut, never a semantic input.
    trainMemo.computeIfAbsent(
      (graft.CacheRegistry.planKey(e), nlist, iters, trainFrac, ppc),
      _ => {
        // ONE resolved count feeds both the cap pricing and the local-
        // route bound (r17 advice: the two independent
        // knownN.getOrElse(e.count()) calls launched a second count job
        // per first-time geometry); countOnce memoizes it across sibling
        // geometries over the same corpus.
        val nOpt =
          if (ppc <= 0) knownN
          else Some(knownN.getOrElse(registry.countOnce(e)))
        val f = cappedTrainFrac(e, nlist, trainFrac, ppc, nOpt)
        val sample =
          if (f >= 1.0) e
          else e.filter(
            detHash32("ivftrain", col("vec_id")) < lit(trainHashCap(f)))
        // Driver-local Lloyd when the training set is driver-sized: the
        // ppc cap bounds it at ~256·nlist rows BY DESIGN at any corpus
        // scale (the FAISS shape — coarse quantizers train on a small
        // sample regardless of index size), so iters×(assign+update)
        // Spark jobs collapse to ONE collect job plus microseconds of
        // driver arithmetic. Guarded to the flat-argmin regime and a
        // conservative row bound; [[trainLloydLocal]] mirrors the
        // distributed path's integer arithmetic exactly (spec-pinned
        // equality), so the route is a work-alike, not a variant.
        val expected = nOpt match {
          case _ if ppc <= 0 => Long.MaxValue
          case Some(n) =>
            if (f >= 1.0) n else math.min(n, ppc.toLong * nlist * 2)
          case None => Long.MaxValue
        }
        if (nlist <= 4096 && expected <= localTrainMaxRows) {
          val cents = trainLloydLocal(collectTrainRows(sample), nlist, iters)
          if (cents.nonEmpty || f >= 1.0) cents
          else trainIvfCentroids(e, nlist, iters)
        } else {
          val cents = trainIvfCentroids(sample, nlist, iters)
          if (cents.isEmpty && f < 1.0) trainIvfCentroids(e, nlist, iters)
          else cents
        }
      })
  }

  /** Row bound for the driver-local training route (per training set:
    * rows × dims longs collected once). The default covers every
    * ppc-capped coarse geometry to nlist≈512 and every ksub≤256 PQ
    * codebook with margin; big-memory hosts can raise it
    * (`graft.train.local.max.rows`), 0 disables the route.
    */
  private def localTrainMaxRows: Long =
    sys.props.get("graft.train.local.max.rows").map(_.toLong)
      .getOrElse(262144L)

  /** One collect job: the (vec_id, v, u) rows a trainer needs, with the
    * SAME detUniform seed ordering key the distributed seed selection
    * sorts on.
    */
  private def collectTrainRows(t: DataFrame): Array[(Long, Array[Long], Double)] = {
    import t.sparkSession.implicits._
    t.select($"vec_id", $"v", detUniform("ivfseed", $"vec_id").as("u"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getDouble(2)))
  }

  /** Driver-local mirror of [[trainIvfCentroids]] — each step replicates
    * the distributed path's arithmetic exactly, so the centroids are
    * bit-identical (SimilaritySpec pins the equality):
    *  - seeds: rows sorted by (u asc, vec_id asc), first nlist, cid by
    *    seed order;
    *  - assignment: argmin over (‖c‖² − 2·<v,c>, cid) in wrapping long
    *    arithmetic — [[graft.functions.VecExprs.argminCentroid]]'s exact
    *    ordering;
    *  - update: per assigned cid, count + per-dim long sums, centroid =
    *    floor(sum.toDouble / cnt) — the same double division; cids with
    *    no rows are dropped, survivors sorted by cid.
    */
  private def trainLloydLocal(rows: Array[(Long, Array[Long], Double)],
      nlist: Int, iters: Int): Seq[(Long, Array[Long])] = {
    if (rows.isEmpty) return Seq.empty
    val dims = rows.head._2.length
    var cents: Seq[(Long, Array[Long])] = rows
      .sortBy(r => (r._3, r._1)).take(nlist)
      .zipWithIndex.map { case (r, i) => (i.toLong, r._2) }.toSeq
    for (_ <- 1 to iters) {
      val cidArr = cents.map(_._1).toArray
      val cvArr = cents.map(_._2).toArray
      val cnsq = cvArr.map(_.map(x => x * x).sum)
      val cnt = new java.util.HashMap[Long, Long]()
      val sums = new java.util.HashMap[Long, Array[Long]]()
      rows.foreach { case (_, v, _) =>
        var best = Long.MaxValue; var bestCid = Long.MaxValue
        var j = 0
        while (j < cvArr.length) {
          val row = cvArr(j)
          var dot = 0L; var i = 0
          while (i < dims) { dot += v(i) * row(i); i += 1 }
          val s = cnsq(j) - 2L * dot
          if (s < best || (s == best && cidArr(j) < bestCid)) {
            best = s; bestCid = cidArr(j)
          }
          j += 1
        }
        cnt.merge(bestCid, 1L, _ + _)
        val acc = sums.computeIfAbsent(bestCid, _ => new Array[Long](dims))
        var i = 0
        while (i < dims) { acc(i) += v(i); i += 1 }
      }
      cents = cnt.keySet().toArray(Array.empty[java.lang.Long])
        .map(_.longValue()).sorted.toSeq.map { cid =>
          val c = cnt.get(cid)
          val s = sums.get(cid)
          (cid, Array.tabulate(dims)(i =>
            math.floor(s(i).toDouble / c).toLong))
        }
    }
    cents
  }

  /** Memoized coarse-quantizer trainings, keyed the way CacheManager
    * keys cache sharing — plus the file snapshot
    * ([[graft.CacheRegistry.planKey]]): a corpus dir REWRITTEN IN PLACE
    * canonicalizes equal to its old self (r17 advice), so the snapshot
    * component is what keeps a retrain from serving stale centroids —
    * plus the full training geometry. Cleared by [[releaseIndexes]].
    */
  @transient private val trainMemo =
    new java.util.concurrent.ConcurrentHashMap[
      (graft.CacheRegistry.Key, Int, Int, Double, Int),
      Seq[(Long, Array[Long])]]()

  private def trainIvfCentroids(e: DataFrame, nlist: Int,
      iters: Int): Seq[(Long, Array[Long])] = {
    import e.sparkSession.implicits._
    var cents: Seq[(Long, Array[Long])] = e
      .select($"vec_id", $"v", detUniform("ivfseed", $"vec_id").as("u"))
      .orderBy($"u".asc, $"vec_id".asc).limit(nlist)
      .select($"v").collect()
      .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Long](0).toArray) }
      .toSeq
    if (cents.isEmpty) return cents
    val dims = cents.head._2.length
    for (_ <- 1 to iters) {
      val sums = (0 until dims).map(i =>
        sum(element_at($"v", i + 1)).as(s"s$i"))
      val rows = e.withColumn("cid", assignExpr(cents))
        .groupBy($"cid")
        .agg(count(lit(1)).as("cnt"), sums: _*)
        .collect()
      cents = rows.map { r =>
        val cnt = r.getAs[Long]("cnt")
        val cv = Array.tabulate(dims)(i =>
          math.floor(r.getAs[Long](s"s$i").toDouble / cnt).toLong)
        (r.getAs[Long]("cid"), cv)
      }.sortBy(_._1).toSeq
    }
    cents
  }

  /** Corpus-side nearest-centroid assignment: ONE native codegen argmin
    * (graft.functions.ArgminCentroid) instead of nlist literal-dot
    * structs + array_min — same (dist, cid) ordering bit-for-bit (the
    * row-constant ‖v‖² term drops out of the argmin), but the generated
    * code no longer grows with nlist, which q92's √n-scaled cluster
    * counts would otherwise push past JIT limits.
    *
    * Above [[hierAssignMinLists]] lists the flat scan itself becomes
    * the bottleneck (√n coarse sizing at 10⁹ vectors is nlist=31623 →
    * 2M integer ops PER CORPUS ROW), so assignment goes two-level
    * (graft.functions.ArgminCentroidHier — the FAISS
    * quantizer-with-its-own-index move): the centroids are Lloyd-
    * clustered into √nlist groups ON THE DRIVER (nlist items — trivial),
    * a row scores the groups, descends into the [[hierAssignProbes]]
    * nearest, and runs the exact argmin over their members —
    * ~(√nlist·(1+probes))·dims ops per row, ~60× fewer at 31k lists.
    * Assignment near group boundaries is approximate (IVF's contract
    * is recall-through-probes, and serving re-derives the SAME
    * deterministic grouping, so build and serve agree); with probes ≥
    * ngroups it is bit-equal to the flat argmin (spec-anchored).
    * Oracled queries all run below the threshold and keep the exact
    * flat path.
    */
  private def assignExpr(cs: Seq[(Long, Array[Long])]): Column =
    if (cs.size <= hierAssignMinLists)
      graft.functions.VecExprs.argminCentroid(col("v"), cs)
    else {
      val ng = math.max(1, math.ceil(math.sqrt(cs.size.toDouble)).toInt)
      // The switch is silent work-alike otherwise — announce it once per
      // geometry so a recall shift at large nlist is attributable (the
      // hier argmin is measured recall-neutral at serve nprobe, but it
      // IS approximate near group boundaries).
      val tag = (cs.size, ng, hierAssignProbes)
      if (hierLogged.add(tag))
        println(s"GRAFT hier-assign active: nlist=${cs.size} ngroups=$ng " +
          s"gProbes=$hierAssignProbes (flat argmin above " +
          s"graft.hier.assign.min.lists=$hierAssignMinLists)")
      val (gc, members) = groupCentroids(cs, ng)
      graft.functions.VecExprs.argminCentroidHier(col("v"), gc, members,
        hierAssignProbes)
    }

  /** Geometries the hier-assignment switch has already announced (one
    * line per distinct (nlist, ngroups, gProbes), not per Lloyd call).
    */
  @transient private val hierLogged =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, Int, Int)]()

  /** Query/batch-side top-nprobe probe. Deliberately ASYMMETRIC with
    * [[assignExpr]]: assignment goes two-level automatically (corpus-
    * sized, measured recall-neutral at serve nprobe), but probing stays
    * FLAT unless opted in — the probe defines WHICH lists get scanned,
    * and restricting the top-nprobe selection to the gProbes nearest
    * groups measured −0.117 bulk recall@3 at nprobe=64/nlist=8192
    * (0.340 vs 0.457) while the flat probe's nlist·dims cost is paid by
    * only nq (or batch) rows. Corpus-sized probe sides (a serve batch
    * at 10⁹-vector scale, where dup-recall — not bulk ranking — is the
    * target) opt in via `graft.hier.probe.min.lists`; the grouping is
    * the SAME deterministic one as assignment, and the hier probe
    * descends into enough nearest groups to cover both gProbes and
    * nprobe, so the probe list length matches the flat probe's
    * min(nprobe, nlist).
    */
  private def probeExpr(v: Column, cs: Seq[(Long, Array[Long])],
      nprobe: Int): Column = {
    val minLists = sys.props.get("graft.hier.probe.min.lists")
      .map(_.toInt).getOrElse(Int.MaxValue)
    if (cs.size <= minLists)
      graft.functions.VecExprs.probeCentroids(v, cs, nprobe)
    else {
      val ng = math.max(1, math.ceil(math.sqrt(cs.size.toDouble)).toInt)
      val (gc, members) = groupCentroids(cs, ng)
      graft.functions.VecExprs.probeCentroidsHier(v, gc, members,
        hierAssignProbes, nprobe)
    }
  }

  /** Max centroid count assigned by the flat per-row argmin; above it
    * [[assignExpr]] goes two-level. Test override:
    * `graft.hier.assign.min.lists` (0 forces hierarchical everywhere).
    */
  private def hierAssignMinLists: Int =
    sys.props.get("graft.hier.assign.min.lists").map(_.toInt)
      .getOrElse(4096)

  /** Groups a hierarchical assignment descends into (more → closer to
    * flat-exact, linearly more member dots). Default 8, measured on
    * 200k vectors at nlist=8192 (IvfProbe): at serve-realistic
    * nprobe=64 hier-8 matches flat recall (0.457 vs 0.453) at 4.7×
    * less wall (68 vs 325 s); at a stress-tiny nprobe=16 probe
    * fraction the approximation costs recall (0.260 vs 0.277), and
    * gProbes=2 is too lossy there (0.147). Training routes through the
    * same assignment (the FAISS clustering_index move — flat training
    * assignment is nlist²-quadratic and infeasible at 31k lists), so
    * geometry depends mildly on this knob. Override:
    * `graft.hier.assign.probes`.
    */
  private def hierAssignProbes: Int =
    sys.props.get("graft.hier.assign.probes").map(_.toInt).getOrElse(8)

  /** Deterministic driver-side Lloyd over the COARSE CENTROIDS
    * themselves (nlist items — no Spark job): strided init in cid
    * order, integer-truncated means, ties to the earlier group; empty
    * groups keep their stale centroid during iteration and are DROPPED
    * from the returned grouping (a probed empty group would scan zero
    * members). Returns (group centroids, per-group (cid, vec) member
    * lists from a final assignment against the final group centroids —
    * every cid in exactly one list). Memoized structurally:
    * assignExpr/probeExpr re-derive the grouping per call (training
    * calls once per Lloyd round), and at 31k lists one driver Lloyd is
    * ~2G int ops — paid once, not per plan.
    */
  @transient private val groupMemo =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long, Long),
      (Seq[Array[Long]], Seq[Seq[(Long, Array[Long])]])]()

  /** Structural 128-bit fingerprint of a centroid set: two independent
    * polynomial hashes (distinct odd multipliers, rotated mixing) over
    * the (cid, values…) stream, plus ngroups and the set size in the
    * key. Array[Long] compares by REFERENCE inside tuples, so a key
    * holding the raw arrays can never hit for centroids re-collected
    * from a DataFrame (per-batch serving would re-run the ~2G-op driver
    * Lloyd on every call and leak a dead entry each time) — and the
    * earlier deep-copy key (cid, v.toSeq) held the whole boxed centroid
    * set per entry, tens of MB at 31k lists. The fingerprint is 32
    * bytes per entry. A key collision would be a false cache HIT —
    * silently serving another centroid set's grouping (wrong group
    * centroids and member vectors), NOT a harmless recompute — so the
    * stakes are real; the probability (~2⁻¹²⁸ for non-adversarial
    * inputs: both independent hashes must collide simultaneously) is
    * beyond-astronomical, and [[groupCentroids]] additionally
    * spot-checks every hit against the live centroid set before
    * trusting it.
    */
  private def centsFingerprint(cs: Seq[(Long, Array[Long])],
      ngroups: Int): (Int, Int, Long, Long) = {
    var h1 = 1125899906842597L
    var h2 = -7046029254386353131L
    cs.foreach { case (cid, v) =>
      h1 = h1 * 31 + cid
      h2 = h2 * 131 + java.lang.Long.rotateLeft(cid, 17)
      var i = 0
      while (i < v.length) {
        h1 = h1 * 31 + v(i)
        h2 = h2 * 131 + java.lang.Long.rotateLeft(v(i), 31)
        i += 1
      }
    }
    (ngroups, cs.size, h1, h2)
  }

  private def groupCentroids(cs: Seq[(Long, Array[Long])], ngroups: Int,
      iters: Int = 5): (Seq[Array[Long]], Seq[Seq[(Long, Array[Long])]]) = {
    val memoKey = centsFingerprint(cs, ngroups)
    val hit = groupMemo.get(memoKey)
    // Cheap hit sanity check (r14 advice): a 128-bit fingerprint
    // collision would silently serve the WRONG grouping, so before
    // trusting a hit, confirm the memoized member lists actually
    // contain this centroid set's first entry with identical values.
    // O(nlist) scan of driver-resident arrays — noise next to the
    // ~2G-op Lloyd a real hit saves.
    if (hit != null && cs.nonEmpty) {
      val (cid0, v0) = cs.head
      val ok = hit._2.exists(_.exists { case (c, v) =>
        c == cid0 && java.util.Arrays.equals(v, v0)
      })
      if (ok) return hit
      groupMemo.remove(memoKey)
    } else if (hit != null) return hit
    // The VALUE still holds the member lists (the centroid vectors
    // themselves — what the hier expressions need), so the bound stays
    // in the low single digits: 4 live geometries ≈ one serve + one
    // build + two probes, beyond which wholesale clear-and-recompute
    // beats multi-GB driver retention.
    if (groupMemo.size >= 4) groupMemo.clear()
    val out = groupCentroidsCompute(cs, ngroups, iters)
    groupMemo.put(memoKey, out)
    out
  }

  private def groupCentroidsCompute(cs: Seq[(Long, Array[Long])],
      ngroups: Int,
      iters: Int): (Seq[Array[Long]], Seq[Seq[(Long, Array[Long])]]) = {
    val sorted = cs.sortBy(_._1).toArray
    val dims = sorted.head._2.length
    var gc: Array[Array[Long]] = Array.tabulate(ngroups)(i =>
      sorted(((i.toLong * sorted.length) / ngroups).toInt)._2.clone())
    def assign(): Array[Int] = {
      val gnsq = gc.map(_.map(x => x * x).sum)
      sorted.map { case (_, v) =>
        var best = Long.MaxValue; var bg = 0; var g = 0
        while (g < gc.length) {
          var dot = 0L; var i = 0
          while (i < dims) { dot += v(i) * gc(g)(i); i += 1 }
          val s = gnsq(g) - 2L * dot
          if (s < best) { best = s; bg = g }
          g += 1
        }
        bg
      }
    }
    var round = 0
    while (round < iters) {
      val asg = assign()
      val sums = Array.fill(ngroups, dims)(0L)
      val cnt = Array.fill(ngroups)(0L)
      var idx = 0
      while (idx < sorted.length) {
        val g = asg(idx); cnt(g) += 1
        var i = 0
        while (i < dims) { sums(g)(i) += sorted(idx)._2(i); i += 1 }
        idx += 1
      }
      gc = Array.tabulate(ngroups)(g =>
        if (cnt(g) == 0) gc(g)
        else Array.tabulate(dims)(i => sums(g)(i) / cnt(g)))
      round += 1
    }
    val finalAsg = assign()
    val members = Array.fill(ngroups)(
      scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])])
    sorted.indices.foreach(i => members(finalAsg(i)) += sorted(i))
    // Drop empty groups (Lloyd keeps a stale centroid for them): a row
    // whose gProbes nearest group centroids were ALL empty would scan
    // zero members and emit a bogus Long.MaxValue list_id. No member is
    // lost — exactness at full probes is unchanged — and both hier
    // expressions then only ever descend into populated groups.
    val keep = (0 until ngroups).filter(g => members(g).nonEmpty)
    (keep.map(g => gc(g)).toSeq, keep.map(g => members(g).toSeq).toSeq)
  }

  /** The serving half: each query probes its nprobe nearest centroid
    * lists (same integer squared-L2 metric and tiebreak as assignment —
    * one native ProbeCentroids top-nprobe per query row), then scores
    * only those lists.
    *
    * TWO broadcasts on purpose: the (qid, list_id) probe pairs prune
    * the corpus, then the per-query payload (qv, qnsq) attaches by qid.
    * A single exploded broadcast would replicate every query's payload
    * nprobe times — at the √n-scaled nprobe a large corpus needs, that
    * duplication alone breaches driver collect limits (measured: the
    * 2M-vector probe died at nprobe=766 when the per-probe-row LUT
    * variant of this shape crossed spark.driver.maxResultSize).
    */
  private def probeAndScore(assigned: DataFrame, queries: DataFrame,
      cents: Seq[(Long, Array[Long])], k: Int, nprobe: Int): DataFrame = {
    import assigned.sparkSession.implicits._
    val qPairs = queries
      .select($"vec_id".as("qid"),
        explode(probeExpr($"v", cents, nprobe)).as("list_id"))
    val qPayload = queries
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nsq".as("qnsq"))
    scoreTopK(assigned.join(broadcast(qPairs), Seq("list_id"))
      .join(broadcast(qPayload), Seq("qid"))
      .filter($"vec_id" =!= $"qid"), k)
  }

  /** Build the IVF index once, persistably: trained centroids as rows
    * (cid, cv) and the corpus assigned to lists (vec_id, v, nsq,
    * list_id) — both plain parquet. The ANN serving shape at scale:
    * training and assignment run offline per corpus generation;
    * [[cosineTopKIvfFromIndex]] then answers query batches against the
    * stored index without touching raw embeddings or re-training.
    *
    * Above 4096 lists (`graft.hier.assign.min.lists`) corpus assignment
    * automatically switches from the exact flat argmin to the two-level
    * approximate form — measured recall-neutral at serve-grade nprobe
    * and ~4.7× less assignment wall at nlist=8192, but list membership
    * near group boundaries can differ from a flat build at the same
    * parameters; the switch announces itself with one `GRAFT
    * hier-assign active` line.
    */
  def ivfIndex(embeddings: DataFrame, nlist: Int = 16,
      iters: Int = 2, trainFrac: Double = 1.0): (DataFrame, DataFrame) = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
    val cents = trainCentroidsSampled(e, nlist, iters, trainFrac)
    val centDf = cents.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
    val assigned =
      if (cents.isEmpty) e.withColumn("list_id", lit(0L)).filter(lit(false))
      else e.withColumn("list_id", assignExpr(cents))
    (centDf, assigned.select($"vec_id", $"v", $"nsq", $"list_id"))
  }

  /** Serve cosine top-k from a stored [[ivfIndex]]: queries are raw
    * (vec_id, embedding) rows; the ≤nlist centroid rows collect to the
    * driver (the same driver-literal shape training uses) and probing/
    * scoring proceed exactly as in [[cosineTopKIvf]] — with identical
    * index parameters the results match the one-shot operator's.
    */
  def cosineTopKIvfFromIndex(centroids: DataFrame, assigned: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    import queries.sparkSession.implicits._
    val cents = registry.collectOnce(centroids)
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    // Uncached quantization: a serving call's query batch is consumed
    // once — registering every batch in the session-lifetime index cache
    // would grow storage per call served.
    val q = queries
      .select($"vec_id", quantize($"embedding").as("v"))
      .withColumn("nsq", normSqQ($"v"))
    if (cents.isEmpty)
      return q.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    probeAndScore(assigned, q, cents, k, nprobe)
  }

  /** Product-quantization ADC cosine top-k — the compressed-residency ANN
    * path. The corpus vector is split into `m` subspaces; each subspace
    * gets its own `ksub`-centroid codebook (the SAME exact-integer Lloyd
    * as [[cosineTopKIvf]], run per subspace), and every vector is encoded
    * as m small codes. Serving is asymmetric distance computation: the
    * query stays full-precision, a per-query lookup table of
    * <query-subvector, codebook-centroid> dots is built once (m×ksub
    * integer dots on the QUERY side only), and a corpus row's approximate
    * dot is m map lookups — no per-pair d-dim arithmetic at all.
    *
    * Why this is the 100 TB shape: a 64-dim float embedding is 256 B; the
    * m=4/ksub≤256 code is 4 B — a 64× compression, which is the difference
    * between an ANN index that fits executor memory and one that
    * re-reads parquet per query batch (FAISS IVF-PQ stores exactly these
    * codes). The scan side is embarrassingly parallel over codes with the
    * query LUTs broadcast; nothing shuffles.
    *
    * Approximate cosine = adot / (‖q‖ · ‖x̂‖) with x̂ the reconstruction
    * (per-subspace centroid): both numerator and ‖x̂‖² are exact integer
    * sums over codebook entries, so the whole result — codebooks, codes,
    * scores — is bit-deterministic and carries a DuckDB oracle
    * ([[pqOracleSql]]) like the rest of the ANN family.
    */
  def cosineTopKPq(embeddings: DataFrame, nQueries: Int, k: Int,
      m: Int = 4, ksub: Int = 8, iters: Int = 2, dims: Int = 64,
      trainFrac: Double = 1.0): DataFrame = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
    val books = pqTrain(e, m, ksub, iters, dims, trainFrac)
    if (books.exists(_.isEmpty))
      return e.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    val corpus = pqEncode(e, books, dims, cacheBase = true)
    pqScore(corpus, e.filter($"vec_id" < nQueries), books, k, dims)
  }

  /** Per-subspace codebooks: the shared integer-Lloyd trainer over the
    * sliced subvectors. Seeds rank on detUniform("ivfseed", vec_id) —
    * vec_id only — so all m subspaces train from the same seed ROWS
    * (one seed CTE in the oracle), while iterating independently.
    * trainFrac < 1 trains every codebook on the SAME hash-cap sample
    * ("ivftrain" on vec_id, as [[trainCentroidsSampled]]) — the bounded
    * index-build cost at corpus scale, composing with the q80 knob.
    * Even at the trainFrac=1 default the training set is capped at
    * [[trainPointsPerCentroid]]·ksub rows ([[cappedTrainFrac]]) — the
    * FAISS heuristic that keeps codebook-build cost bounded however
    * large the corpus.
    */
  private def pqTrain(e: DataFrame, m: Int, ksub: Int, iters: Int,
      dims: Int, trainFrac: Double = 1.0,
      knownN: Option[Long] = None): Seq[Seq[(Long, Array[Long])]] =
    // Same memo doctrine as [[trainCentroidsSampled]]: the codebooks are
    // a pure deterministic function of (corpus plan, m, ksub, iters,
    // dims, trainFrac) — q97/q98-style siblings at one geometry share
    // one codebook build per session instead of re-running the fused
    // Lloyd jobs per query.
    pqTrainMemo.computeIfAbsent(
      (graft.CacheRegistry.planKey(e), m, ksub, iters, dims, trainFrac),
      _ => pqTrainUncached(e, m, ksub, iters, dims, trainFrac, knownN))

  @transient private val pqTrainMemo =
    new java.util.concurrent.ConcurrentHashMap[
      (graft.CacheRegistry.Key, Int, Int, Int, Int, Double),
      Seq[Seq[(Long, Array[Long])]]]()

  private def pqTrainUncached(e: DataFrame, m: Int, ksub: Int, iters: Int,
      dims: Int, trainFrac: Double = 1.0,
      knownN: Option[Long] = None): Seq[Seq[(Long, Array[Long])]] = {
    import e.sparkSession.implicits._
    require(dims % m == 0, s"dims=$dims must divide into m=$m subspaces")
    val len = dims / m

    // All m subspaces train in ONE pass per stage instead of m
    // independent trainers: the seeds are slices of the same nlist rows
    // (the rank is on vec_id only), and each Lloyd iteration is one job
    // over the exploded (sub, subv) relation — a CASE over m native
    // argmins then one groupBy(sub, cid) sum. m×(1+iters) full-scan
    // jobs collapse to 1+iters; at ksub=256 (q97/q98's retrieval-grade
    // geometry) this is the difference between the codebook build
    // dominating the query and disappearing into it. Integer arithmetic
    // and (dist, cid) ordering are unchanged, so the codebooks are
    // bit-identical to the per-subspace formulation the DuckDB oracle
    // replays.
    def trainOn(t: DataFrame): Seq[Seq[(Long, Array[Long])]] = {
      val seedRows = t
        .select($"vec_id", $"v", detUniform("ivfseed", $"vec_id").as("u"))
        .orderBy($"u".asc, $"vec_id".asc).limit(ksub)
        .select($"v").collect()
        .map(_.getSeq[Long](0).toArray)
      if (seedRows.isEmpty) return Seq.fill(m)(Seq.empty)
      var books: Seq[Seq[(Long, Array[Long])]] = (0 until m).map { s =>
        seedRows.zipWithIndex.map { case (v, i) =>
          (i.toLong, v.slice(s * len, s * len + len))
        }.toSeq
      }
      val sliced = t.select($"vec_id", posexplode(array(
        (0 until m).map(s => slice($"v", s * len + 1, len)): _*))
        .as(Seq("sub", "subv")))
      for (_ <- 1 to iters) {
        val cidExpr = (1 until m).foldLeft(
          when($"sub" === 0,
            graft.functions.VecExprs.argminCentroid($"subv", books(0)))) {
          (acc, s) => acc.when($"sub" === s,
            graft.functions.VecExprs.argminCentroid($"subv", books(s)))
        }
        val sums = (0 until len).map(i =>
          sum(element_at($"subv", i + 1)).as(s"s$i"))
        val rows = sliced.withColumn("cid", cidExpr)
          .groupBy($"sub", $"cid")
          .agg(count(lit(1)).as("cnt"), sums: _*)
          .collect()
        books = (0 until m).map { s =>
          rows.filter(_.getAs[Int]("sub") == s).map { r =>
            val cnt = r.getAs[Long]("cnt")
            val cv = Array.tabulate(len)(i =>
              math.floor(r.getAs[Long](s"s$i").toDouble / cnt).toLong)
            (r.getAs[Long]("cid"), cv)
          }.sortBy(_._1).toSeq
        }
      }
      books
    }

    // ONE resolved count (r17 advice): cappedTrainFrac and the local-
    // route bound both need n — resolve it once, memoized per corpus
    // plan, instead of two independent count jobs.
    val n = knownN.getOrElse(registry.countOnce(e))
    val f = cappedTrainFrac(e, ksub, trainFrac, trainPointsPerCentroid,
      Some(n))
    val sample =
      if (f >= 1.0) e
      else e.filter(
        detHash32("ivftrain", col("vec_id")) < lit(trainHashCap(f)))
    // Same driver-local route as [[trainCentroidsSampled]]: the ksub-
    // capped training set is driver-sized by construction, so the
    // 1+iters fused Lloyd jobs collapse to ONE collect. The local
    // mirror replicates the fused trainer's arithmetic exactly —
    // per-subspace argmin in wrapping longs, (sub, cid) grouped long
    // sums, floor(sum.toDouble/cnt) — spec-pinned equality.
    val expected =
      if (f >= 1.0) n
      else math.min(n, trainPointsPerCentroid.toLong * ksub * 2)
    if (expected <= localTrainMaxRows) {
      val books = pqTrainLocal(collectTrainRows(sample), m, ksub, iters, len)
      if (books.exists(_.isEmpty) && f < 1.0) {
        // Guard BEFORE the full-corpus collect (r17 advice): the bound
        // exists to keep corpus-sized collects off the driver, so it
        // must be checked before collectTrainRows(e), not after.
        if (n <= localTrainMaxRows)
          pqTrainLocal(collectTrainRows(e), m, ksub, iters, len)
        else trainOn(e)
      } else books
    } else if (f >= 1.0) trainOn(e)
    else {
      val books = trainOn(sample)
      if (books.exists(_.isEmpty)) trainOn(e) else books
    }
  }

  /** Driver-local mirror of [[pqTrainUncached]]'s fused trainer — see
    * [[trainLloydLocal]] for the exactness contract. Seeds are the
    * (u, vec_id)-sorted first ksub rows sliced per subspace; each
    * iteration assigns every row's subvector to its subspace codebook
    * by the argmin ordering and rebuilds centroids with the same
    * floor-of-double division, dropping empty cids.
    */
  private def pqTrainLocal(rows: Array[(Long, Array[Long], Double)],
      m: Int, ksub: Int, iters: Int,
      len: Int): Seq[Seq[(Long, Array[Long])]] = {
    if (rows.isEmpty) return Seq.fill(m)(Seq.empty)
    val seeds = rows.sortBy(r => (r._3, r._1)).take(ksub)
    var books: Seq[Seq[(Long, Array[Long])]] = (0 until m).map { s =>
      seeds.zipWithIndex.map { case (r, i) =>
        (i.toLong, r._2.slice(s * len, s * len + len))
      }.toSeq
    }
    for (_ <- 1 to iters) {
      val next = (0 until m).map { s =>
        val cs = books(s)
        val cidArr = cs.map(_._1).toArray
        val cvArr = cs.map(_._2).toArray
        val cnsq = cvArr.map(_.map(x => x * x).sum)
        val cnt = new java.util.HashMap[Long, Long]()
        val sums = new java.util.HashMap[Long, Array[Long]]()
        rows.foreach { case (_, v, _) =>
          var best = Long.MaxValue; var bestCid = Long.MaxValue
          var j = 0
          while (j < cvArr.length) {
            val row = cvArr(j)
            var dot = 0L; var i = 0
            while (i < len) { dot += v(s * len + i) * row(i); i += 1 }
            val d = cnsq(j) - 2L * dot
            if (d < best || (d == best && cidArr(j) < bestCid)) {
              best = d; bestCid = cidArr(j)
            }
            j += 1
          }
          cnt.merge(bestCid, 1L, _ + _)
          val acc = sums.computeIfAbsent(bestCid, _ => new Array[Long](len))
          var i = 0
          while (i < len) { acc(i) += v(s * len + i); i += 1 }
        }
        cnt.keySet().toArray(Array.empty[java.lang.Long])
          .map(_.longValue()).sorted.toSeq.map { cid =>
            val c = cnt.get(cid)
            val sv = sums.get(cid)
            (cid, Array.tabulate(len)(i =>
              math.floor(sv(i).toDouble / c).toLong))
          }
      }
      books = next
    }
    books
  }

  /** Lloyd can leave a centroid empty (its cid then has no row in the
    * update aggregate), so cids are not guaranteed contiguous — the
    * codebook norms are laid out as a cid-INDEXED dense array (holes 0,
    * never read: codes are argmin winners over the same codebook), the
    * same positional contract as [[pqLut]]'s native table, so the
    * corpus-side read is an O(1) array element_at instead of an O(ksub)
    * literal-map scan per code.
    */
  private def cnsqArr(cs: Seq[(Long, Array[Long])]): Seq[Long] = {
    val width = cs.map(_._1).max.toInt + 1
    val out = Array.fill(width)(0L)
    cs.foreach { case (cid, cv) => out(cid.toInt) = cv.map(x => x * x).sum }
    out.toSeq
  }

  /** Encoder: argmin over (cnsq − 2·dot, cid) — exactly
    * [[assignExpr]]'s native argmin, applied to the sliced subvector
    * against subspace s's codebook.
    */
  private def pqEncodeSub(subv: Column,
      cs: Seq[(Long, Array[Long])]): Column =
    graft.functions.VecExprs.argminCentroid(subv, cs)

  /** Corpus → (vec_id, c0..c_{m-1}, rnsq): the compressed rows the scan
    * side touches. rnsq = ‖reconstruction‖² (integer, from codebook
    * norms) — stored with the codes so serving never reopens vectors.
    *
    * `cacheBase = true` (corpus-sized callers) computes the code
    * columns ONCE into a registry-cached base and derives rnsq from the
    * cached c$s: rnsq references every code column, and CollapseProject
    * otherwise inlines the ksub-wide argmin into each reference —
    * measured 4.5× the whole encode at ksub=256/20k vectors on the
    * residual path's analogous cross-term (codegen subexpression
    * elimination does not dedupe the reference-object argmins). Leave
    * false for batch-sized appends ([[ivfPqAdd]]) — a session-lifetime
    * cache entry per serving batch would grow storage per call, and the
    * duplicated argmin on a batch is cheap.
    */
  private def pqEncode(e: DataFrame, books: Seq[Seq[(Long, Array[Long])]],
      dims: Int, extra: Seq[String] = Nil,
      cacheBase: Boolean = false): DataFrame = {
    import e.sparkSession.implicits._
    import org.apache.spark.sql.functions.typedlit
    val m = books.size
    val len = dims / m
    val codeCols = (0 until m).map(s =>
      pqEncodeSub(slice($"v", s * len + 1, len), books(s)).as(s"c$s"))
    val rnsq = (0 until m).map(s =>
      lutAt(typedlit(cnsqArr(books(s))), col(s"c$s"))).reduce(_ + _)
    val base = e.select((($"vec_id" +: codeCols) ++ extra.map(col)): _*)
    (if (cacheBase) registry.cache(base) else base)
      .withColumn("rnsq", rnsq)
  }

  /** ADC scoring: per-query LUTs map cid → <q_sub, centroid> (integer;
    * m×ksub dots evaluated on the query rows — the entire full-precision
    * work), broadcast against the code rows; a corpus row costs m map
    * lookups.
    */
  /** Per-query per-subspace ADC lookup table: a cid-INDEXED array<long>
    * of <q_sub, centroid> dots (the full-precision work, all on the
    * query side) — ONE native PqAdcLut expression with the codebook as a
    * reference object. The map_from_arrays-of-literal-dots shape it
    * replaces carried m×ksub literal expressions (at ksub=256 the
    * generated projection blew the 64 KB JIT limit → interpreted
    * fallback on the scan) and paid an O(ksub) map scan per corpus-side
    * lookup; the array form is O(1) positional element_at in codegen.
    */
  private def pqLut(qsub: Column, cs: Seq[(Long, Array[Long])]): Column =
    graft.functions.VecExprs.pqAdcLut(qsub, cs)

  /** Corpus-side ADC read of [[pqLut]]'s table: element_at is 1-based,
    * codes (cids) are 0-based positions.
    */
  private def lutAt(lut: Column, code: Column): Column =
    element_at(lut, (code + lit(1L)).cast("int"))

  private def pqScore(corpus: DataFrame, queries: DataFrame,
      books: Seq[Seq[(Long, Array[Long])]], k: Int, dims: Int): DataFrame = {
    import corpus.sparkSession.implicits._
    val m = books.size
    val len = dims / m
    val qq = queries
      .select(($"vec_id".as("qid") +: $"nsq".as("qnsq") +:
        (0 until m).map(s => pqLut(slice($"v", s * len + 1, len), books(s))
          .as(s"lut$s"))): _*)
    val adot = (0 until m).map(s =>
      lutAt(col(s"lut$s"), col(s"c$s"))).reduce(_ + _)
    val scored = corpus.join(broadcast(qq), $"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("nid"),
        (adot.cast("double") / sqrt($"qnsq".cast("double")) /
          sqrt($"rnsq".cast("double"))).as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid".asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
  }

  /** Build the PQ index persistably: codebooks as rows (s, cid, cv) and
    * the corpus as compressed code rows (vec_id, c0.., rnsq) — both plain
    * parquet. This is the residency story at 100 TB: the code table is
    * ~64× smaller than the raw embeddings (4 bytes of codes vs 256 bytes
    * of floats at 64 dims), so the SERVING working set fits where the
    * corpus never could; raw vectors are only read at build time.
    */
  def pqIndex(embeddings: DataFrame, m: Int = 4, ksub: Int = 8,
      iters: Int = 2, dims: Int = 64,
      trainFrac: Double = 1.0): (DataFrame, DataFrame) = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
    val books = pqTrain(e, m, ksub, iters, dims, trainFrac)
    val bookDf = books.zipWithIndex.flatMap { case (cs, s) =>
      cs.map { case (cid, cv) => (s, cid, cv.toSeq) }
    }.toDF("s", "cid", "cv")
    val codes =
      if (books.exists(_.isEmpty))
        pqEncode(e, Seq.fill(books.size)(Seq((0L, Array(0L)))), dims)
          .filter(lit(false))
      else pqEncode(e, books, dims, cacheBase = true)
    (bookDf, codes)
  }

  /** Serve cosine top-k from a stored [[pqIndex]]: the ≤m×ksub codebook
    * rows collect to the driver (same driver-literal shape as training)
    * and scoring proceeds exactly as in [[cosineTopKPq]] — with identical
    * index parameters the results match the one-shot operator's.
    */
  def cosineTopKPqFromIndex(codebooks: DataFrame, codes: DataFrame,
      queries: DataFrame, k: Int, dims: Int = 64): DataFrame = {
    import queries.sparkSession.implicits._
    val books = registry.collectOnce(codebooks)
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.map { case (_, cid, cv) => (cid, cv) }.sortBy(_._1).toSeq }
    val q = queries
      .select($"vec_id", quantize($"embedding").as("v"))
      .withColumn("nsq", normSqQ($"v"))
    if (books.isEmpty || books.exists(_.isEmpty))
      return q.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    pqScore(codes, q, books, k, dims)
  }

  /** IVF-PQ cosine top-k — the composed 100 TB ANN shape (FAISS
    * IndexIVFPQ): the coarse quantizer of [[cosineTopKIvf]] prunes the
    * corpus to the query's `nprobe` nearest lists, and within those lists
    * scoring is [[cosineTopKPq]]'s ADC over 4-byte codes. Flat PQ scans
    * every code per query (linear, cheap per row but still corpus-sized);
    * this touches only ~nprobe/nlist of the code table per query, and the
    * codes it does touch are the compressed residency story — neither
    * half alone gives both properties.
    *
    * Codes encode the RAW vector, not the residual (FAISS
    * `by_residual=false`): the m codebooks stay list-independent, the ADC
    * tables are built once per query (not once per probed list), and at
    * nprobe=nlist the result is EXACTLY flat PQ's (PqSpec proves this) —
    * residual encoding would buy precision at the cost of per-list LUTs
    * and an oracle that no longer shares [[pqOracleSql]]'s chains.
    *
    * Everything is the families' shared exact-integer arithmetic, so the
    * composition carries a DuckDB oracle ([[ivfPqOracleSql]]) like both
    * halves. Scale shape: coarse train/assign as in [[cosineTopKIvf]]
    * (map-side assignment, one bounded aggregate per Lloyd iteration);
    * PQ train/encode as in [[cosineTopKPq]]; serving joins the broadcast
    * (query × probed-list, LUT) rows against the code table on list_id —
    * the only scan, pruned by the coarse index, nothing shuffles.
    */
  def cosineTopKIvfPq(embeddings: DataFrame, nQueries: Int, k: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 4, ksub: Int = 8,
      iters: Int = 2, dims: Int = 64, trainFrac: Double = 1.0): DataFrame = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
    val cents = trainCentroidsSampled(e, nlist, iters, trainFrac)
    val books = pqTrain(e, m, ksub, iters, dims, trainFrac)
    if (cents.isEmpty || books.exists(_.isEmpty))
      return e.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    val codes = pqEncode(e.withColumn("list_id", assignExpr(cents)),
      books, dims, extra = Seq("list_id"), cacheBase = true)
    pqScoreProbed(codes, e.filter($"vec_id" < nQueries), cents, books,
      k, nprobe, dims)
  }

  /** The IVF-PQ serving join: each query row explodes into its nprobe
    * (list_id, LUT…) probe rows (same native ProbeCentroids probing as
    * [[probeAndScore]]), broadcast against the code table keyed on
    * list_id; a candidate costs m map lookups, exactly [[pqScore]]'s ADC.
    */
  private def pqScoreProbed(codes: DataFrame, queries: DataFrame,
      cents: Seq[(Long, Array[Long])], books: Seq[Seq[(Long, Array[Long])]],
      k: Int, nprobe: Int, dims: Int): DataFrame = {
    import codes.sparkSession.implicits._
    val m = books.size
    val len = dims / m
    // Probe pairs and per-query LUTs broadcast SEPARATELY: the m luts
    // are m·ksub longs per query (32 KB at m=16·ksub=256) and depend
    // only on qid — folding them into the exploded probe frame would
    // replicate each query's luts nprobe times, and at the √n-scaled
    // nprobe a 2M-vector corpus needs (~770) that duplication alone is
    // a multi-GB broadcast (measured: breached maxResultSize at 2M,
    // target 0.9). Split, the pair side is 16 bytes/row and the lut
    // side is nq rows total.
    val qPairs = queries.select($"vec_id".as("qid"),
      explode(probeExpr($"v", cents, nprobe)).as("list_id"))
    val qLuts = queries
      .select(($"vec_id".as("qid") +: $"nsq".as("qnsq") +:
        (0 until m).map(s => pqLut(slice($"v", s * len + 1, len), books(s))
          .as(s"lut$s"))): _*)
    val adot = (0 until m).map(s =>
      lutAt(col(s"lut$s"), col(s"c$s"))).reduce(_ + _)
    val scored = codes.join(broadcast(qPairs), Seq("list_id"))
      .join(broadcast(qLuts), Seq("qid"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("nid"),
        (adot.cast("double") / sqrt($"qnsq".cast("double")) /
          sqrt($"rnsq".cast("double"))).as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid".asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
  }

  /** Assign raw vectors to a stored [[ivfIndex]]'s lists WITHOUT
    * retraining — the index-maintenance half of streaming ingest (the
    * FAISS `add` analog): quantize, one native argmin per row against
    * the collected centroids, emit rows append-compatible with the
    * index's assigned table. Centroid drift under a shifting
    * distribution is the standard operational caveat — rebuild the
    * index periodically, exactly as FAISS deployments do.
    */
  def ivfAssign(centroids: DataFrame, vectors: DataFrame): DataFrame = {
    import vectors.sparkSession.implicits._
    val cents = registry.collectOnce(centroids)
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    val q = vectors
      .select($"vec_id", quantize($"embedding").as("v"))
      .withColumn("nsq", normSqQ($"v"))
    if (cents.isEmpty)
      q.filter(lit(false)).withColumn("list_id", lit(0L))
        .select($"vec_id", $"v", $"nsq", $"list_id")
    else
      q.withColumn("list_id", assignExpr(cents))
        .select($"vec_id", $"v", $"nsq", $"list_id")
  }

  /** Index staleness metric: the mean squared quantized distance of
    * every stored vector to its assigned centroid, computable from the
    * persisted index alone (the assigned table keeps v/nsq; centroids
    * are ≤nlist rows, broadcast). [[ivfAssign]] appends without
    * retraining, so under a shifting ingest distribution the lists
    * drift away from the trained centroids and probe recall silently
    * degrades — the FAISS re-train problem. Record this cost right
    * after [[ivfIndex]]/[[ivfReindex]] as the baseline; when the ratio
    * current/baseline exceeds an operating threshold (~1.5 is a sane
    * default), rebuild with [[ivfReindex]]. One bounded aggregate, no
    * corpus-sized shuffle; exact integer arithmetic per row, so the
    * metric is deterministic and engine-independent.
    */
  def ivfAssignCost(centroids: DataFrame, assigned: DataFrame): Double = {
    import assigned.sparkSession.implicits._
    val c = centroids.select($"cid".as("list_id"), $"cv")
    assigned.join(broadcast(c), Seq("list_id"))
      .select(($"nsq" + dotQ($"cv", $"cv") - lit(2L) * dotQ($"v", $"cv"))
        .cast("double").as("d2"))
      .agg(avg($"d2")).head() match {
        case r if r.isNullAt(0) => 0.0
        case r => r.getDouble(0)
      }
  }

  /** Re-train the coarse quantizer FROM THE STORED INDEX (no raw
    * embedding read): Lloyd over the assigned table's quantized vectors,
    * then one re-assignment pass — the rebuild half of the staleness
    * loop, FAISS's periodic `train`+`add` replay. Output shapes match
    * [[ivfIndex]] exactly, so the rebuilt index drops into the same
    * serve/append paths.
    */
  def ivfReindex(assigned: DataFrame, nlist: Int = 16, iters: Int = 2,
      trainFrac: Double = 1.0): (DataFrame, DataFrame) = {
    import assigned.sparkSession.implicits._
    val e = assigned.select($"vec_id", $"v", $"nsq")
    val cents = trainCentroidsSampled(e, nlist, iters, trainFrac)
    val centDf = cents.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
    val reassigned =
      if (cents.isEmpty) e.withColumn("list_id", lit(0L)).filter(lit(false))
      else e.withColumn("list_id", assignExpr(cents))
    (centDf, reassigned.select($"vec_id", $"v", $"nsq", $"list_id"))
  }

  /** Embedding near-dups of an INCOMING batch against a stored
    * [[ivfIndex]] corpus — the serving-side embedding dedup an ingest
    * pipeline runs per batch (the cosine counterpart of the text
    * family's q77 incremental near-dup): each new vector probes its
    * `nprobe` nearest lists and any indexed vector there at ≥ minCos is
    * reported as (vec_id, dup_of, cos). Approximate with the same
    * contract as every IVF path — recall is the probability the true
    * neighbor's list is probed — but deterministic bit-for-bit, so q95
    * carries a full DuckDB replay.
    *
    * Scale shape: the index is built once offline; per batch the work
    * is |batch|·nlist probe evals (one native ProbeCentroids per row)
    * plus a broadcast join of the batch's probe rows against the
    * assigned corpus pruned to probed lists. Nothing corpus-sized
    * shuffles at serve time, and each corpus vector lives in exactly
    * one list, so no post-join dedup is needed.
    */
  def cosineNearDupsFromIndex(centroids: DataFrame, assigned: DataFrame,
      queries: DataFrame, minCos: Double, nprobe: Int = 4): DataFrame = {
    import queries.sparkSession.implicits._
    val cents = registry.collectOnce(centroids)
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    val q = queries
      .select($"vec_id", quantize($"embedding").as("v"))
      .withColumn("nsq", normSqQ($"v"))
    if (cents.isEmpty)
      return q.filter(lit(false)).select($"vec_id",
        $"vec_id".as("dup_of"), lit(0d).as("cos"))
    // Two broadcasts (see [[probeAndScore]]'s scale note): probe pairs
    // prune the corpus, the per-query vector attaches once by qid
    // instead of riding every probe row.
    val qPairs = q.select($"vec_id".as("qid"),
      explode(probeExpr($"v", cents, nprobe)).as("list_id"))
    val qPayload = q.select($"vec_id".as("qid"), $"v".as("qv"),
      $"nsq".as("qnsq"))
    assigned.join(broadcast(qPairs), Seq("list_id"))
      .join(broadcast(qPayload), Seq("qid"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("dup_of"),
        (dotQ($"qv", $"v").cast("double") /
          sqrt($"qnsq".cast("double")) / sqrt($"nsq".cast("double")))
          .as("cos"))
      .filter($"cos" >= minCos)
      .select($"qid".as("vec_id"), $"dup_of", $"cos")
  }

  /** Build the composed IVF-PQ index persistably: coarse centroids
    * (cid, cv), per-subspace codebooks (s, cid, cv), and the corpus as
    * (vec_id, c0.., list_id, rnsq) code rows — all plain parquet. The
    * full 100 TB serving layout: the coarse index prunes which code rows
    * a query batch touches, the codes keep the touched rows ~64× smaller
    * than raw vectors, and raw embeddings are read only at build time.
    */
  def ivfPqIndex(embeddings: DataFrame, nlist: Int = 16, m: Int = 4,
      ksub: Int = 8, iters: Int = 2, dims: Int = 64,
      trainFrac: Double = 1.0): (DataFrame, DataFrame, DataFrame) = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
    val cents = trainCentroidsSampled(e, nlist, iters, trainFrac)
    val books = pqTrain(e, m, ksub, iters, dims, trainFrac)
    val centDf = cents.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
    val bookDf = books.zipWithIndex.flatMap { case (cs, s) =>
      cs.map { case (cid, cv) => (s, cid, cv.toSeq) }
    }.toDF("s", "cid", "cv")
    val codes =
      if (cents.isEmpty || books.exists(_.isEmpty))
        pqEncode(e.withColumn("list_id", lit(0L)),
          Seq.fill(math.max(1, books.size))(Seq((0L, Array(0L)))), dims,
          extra = Seq("list_id")).filter(lit(false))
      else pqEncode(e.withColumn("list_id", assignExpr(cents)), books, dims,
        extra = Seq("list_id"), cacheBase = true)
    (centDf, bookDf, codes)
  }

  /** Serve cosine top-k from a stored [[ivfPqIndex]]: the ≤nlist
    * centroid and ≤m×ksub codebook rows collect to the driver (the same
    * driver-literal shape as training) and probing/scoring proceed
    * exactly as in [[cosineTopKIvfPq]] — with identical index parameters
    * the results match the one-shot operator's.
    */
  /** A nested array<array<bigint>> driver table as ONE Catalyst Literal.
    * `typedlit` builds nested Scala collections as a CreateArray tree —
    * thousands of leaf expressions RE-EVALUATED PER ROW (measured: the
    * residual encode's cross-term lookups through a typedlit 2D table
    * cost 4× the rest of the encode at 20k vectors; a single Literal's
    * ArrayData is built once and indexing it is O(1)).
    */
  private def lit2dLong(v: Seq[Seq[Long]]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(v,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType))))

  /** cid-INDEXED dense table of one codebook's centroid vectors
    * (sub-vector length `len`) — the literal a per-row "dot with MY
    * code's centroid" lookup reads, m·len integer ops per row where a
    * per-row LUT ([[pqLut]]) would burn m·ksub dots to read one entry.
    */
  private def bookDense(cs: Seq[(Long, Array[Long])],
      len: Int): Seq[Seq[Long]] = {
    val width = cs.map(_._1).max.toInt + 1
    val arr = Array.fill(width)(Seq.fill(len)(0L))
    cs.foreach { case (cid, cv) => arr(cid.toInt) = cv.toSeq }
    arr.toSeq
  }

  /** cid-INDEXED dense driver tables of the coarse centroids — vectors
    * and squared norms (Lloyd can leave cid holes; same positional
    * contract as [[cnsqArr]]/[[pqLut]]: holes carry zero entries and are
    * never read, since list_id is always an argmin winner).
    */
  private def centDense(cents: Seq[(Long, Array[Long])],
      dims: Int): (Seq[Seq[Long]], Seq[Long]) = {
    val width = cents.map(_._1).max.toInt + 1
    val vecs = Array.fill(width)(Seq.fill(dims)(0L))
    val nsqs = Array.fill(width)(0L)
    cents.foreach { case (cid, cv) =>
      vecs(cid.toInt) = cv.toSeq
      nsqs(cid.toInt) = cv.map(x => x * x).sum
    }
    (vecs.toSeq, nsqs.toSeq)
  }

  /** Collect a stored codebooks table (s, cid, cv) back to the
    * driver-literal shape every PQ path consumes — ≤ m·ksub rows, the
    * same bounded collect as index serving.
    */
  private def collectBooks(
      codebooks: DataFrame): Seq[Seq[(Long, Array[Long])]] =
    registry.collectOnce(codebooks)
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.map { case (_, cid, cv) => (cid, cv) }.sortBy(_._1).toSeq }

  def cosineTopKIvfPqFromIndex(centroids: DataFrame, codebooks: DataFrame,
      codes: DataFrame, queries: DataFrame, k: Int, nprobe: Int = 4,
      dims: Int = 64): DataFrame = {
    import queries.sparkSession.implicits._
    val cents = registry.collectOnce(centroids)
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    val books = collectBooks(codebooks)
    val q = queries
      .select($"vec_id", quantize($"embedding").as("v"))
      .withColumn("nsq", normSqQ($"v"))
    if (cents.isEmpty || books.isEmpty || books.exists(_.isEmpty))
      return q.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    pqScoreProbed(codes, q, cents, books, k, nprobe, dims)
  }

  /** Append a batch into a stored [[ivfPqIndex]] WITHOUT retraining —
    * the composed-index half of the FAISS `add` path ([[ivfAssign]]'s
    * counterpart): quantize, assign each vector to its nearest STORED
    * coarse centroid, encode against the STORED codebooks, and emit
    * rows append-compatible with the index's codes table. Per batch the
    * work is |batch|·(nlist + m·ksub) distance evaluations, all
    * map-side against driver-literal index objects — nothing
    * corpus-sized moves.
    *
    * Drift caveat, sharpened for the composed index: appends degrade
    * BOTH the coarse lists (probe recall) and the codebooks (ADC
    * ranking), and since codes are not invertible the rebuild input is
    * the RAW embeddings, re-read from the corpus store ([[ivfPqIndex]]
    * again) — storing decodable vectors beside the codes would forfeit
    * the ~64× compression that justifies PQ at 100 TB, so the engine
    * deliberately does not. [[ivfPqAddCost]] is the staleness signal
    * that says when to pay that rebuild.
    */
  def ivfPqAdd(centroids: DataFrame, codebooks: DataFrame,
      vectors: DataFrame, dims: Int = 64): DataFrame = {
    import vectors.sparkSession.implicits._
    val cents = registry.collectOnce(centroids)
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    val books = collectBooks(codebooks)
    val e = vectors
      .select($"vec_id", quantize($"embedding").as("v"))
      .withColumn("nsq", normSqQ($"v"))
    if (cents.isEmpty || books.isEmpty || books.exists(_.isEmpty))
      return pqEncode(e.withColumn("list_id", lit(0L)),
        Seq.fill(math.max(1, books.size))(Seq((0L, Array(0L)))), dims,
        extra = Seq("list_id")).filter(lit(false))
    pqEncode(e.withColumn("list_id", assignExpr(cents)), books, dims,
      extra = Seq("list_id"))
  }

  /** Composed-index staleness metric, measured on an incoming batch at
    * the moment it still has raw vectors in hand (the only moment the
    * codes' quantization error is observable at all — stored codes are
    * not invertible): returns (coarseCost, pqResidual) where coarseCost
    * is the mean squared distance of each batch vector to its nearest
    * stored centroid (exactly [[ivfAssignCost]]'s quantity, on the
    * batch) and pqResidual is the mean squared PQ reconstruction error
    * ‖v − x̂‖² = nsq + rnsq − 2·Σₛ⟨vₛ, cbₛ(cₛ)⟩ — both exact-integer per
    * row, one bounded aggregate total.
    *
    * Operating loop (the [[ivfAssignCost]] pattern, composed): record
    * both numbers right after [[ivfPqIndex]] on a held-out slice of the
    * build corpus as the baseline; per [[ivfPqAdd]] batch, compute them
    * on the batch and append to a small stats table beside the index.
    * When either ratio vs baseline exceeds the operating threshold
    * (~1.5), rebuild from the raw corpus — coarse drift loses probed
    * lists, codebook drift mis-ranks the ADC scan, and either alone
    * silently degrades recall (PipelineSpec's composed drift test shows
    * the trip → rebuild → recovery cycle).
    */
  def ivfPqAddCost(centroids: DataFrame, codebooks: DataFrame,
      vectors: DataFrame, dims: Int = 64): (Double, Double) = {
    import vectors.sparkSession.implicits._
    val cents = registry.collectOnce(centroids)
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    val books = collectBooks(codebooks)
    if (cents.isEmpty || books.isEmpty || books.exists(_.isEmpty))
      return (0.0, 0.0)
    val m = books.size
    val len = dims / m
    val coded = pqEncode(
      vectors.select($"vec_id", quantize($"embedding").as("v"))
        .withColumn("nsq", normSqQ($"v"))
        .withColumn("list_id", assignExpr(cents)),
      books, dims, extra = Seq("list_id", "v", "nsq"))
    val (centTable, cnsqA) = centDense(cents, dims)
    // ⟨vₛ, cbₛ(cₛ)⟩ as one dot per subspace against the row's own
    // code's centroid (bookDense literal lookup — m·len ops per row,
    // not the m·ksub a per-row LUT would burn). Exact integers, so the
    // residual is exact.
    val recDot = (0 until m).map(s =>
      dotQ(slice($"v", s * len + 1, len),
        element_at(lit2dLong(bookDense(books(s), len)),
          (col(s"c$s") + 1).cast("int"))))
      .reduce(_ + _)
    import org.apache.spark.sql.functions.typedlit
    val centDot = graft.functions.VecExprs.dotQ($"v",
      element_at(lit2dLong(centTable), ($"list_id" + 1).cast("int")))
    val row = coded.select(
      avg(($"nsq" + element_at(typedlit(cnsqA), ($"list_id" + 1).cast("int"))
        - lit(2L) * centDot).cast("double")).as("coarse"),
      avg(($"nsq" + $"rnsq" - lit(2L) * recDot).cast("double")).as("pq"))
      .head()
    (if (row.isNullAt(0)) 0.0 else row.getDouble(0),
      if (row.isNullAt(1)) 0.0 else row.getDouble(1))
  }

  /** Full-precision re-rank of an approximate candidate set (the FAISS
    * `IndexRefineFlat` pattern, faiss/IndexRefine.h): `cand` holds
    * (qid, nid) pairs an ADC scan selected; each is re-scored with the
    * EXACT integer dot over the raw quantized vectors and the top-k by
    * exact cosine is kept. The candidate set is nQueries·R rows —
    * broadcast both ways — so the only corpus-sized work is one scan of
    * `e` semi-joined to the candidates; nothing corpus-sized shuffles,
    * and the refine cost is independent of corpus size.
    */
  private def refineExact(e: DataFrame, cand: DataFrame, nQueries: Int,
      k: Int): DataFrame = {
    import e.sparkSession.implicits._
    refineExactWith(e, e.filter($"vec_id" < nQueries)
      .select($"vec_id".as("qid"), $"v".as("qv"), $"nsq".as("qnsq")),
      cand, k)
  }

  /** [[refineExact]] against an explicit quantized query frame (qid,
    * qv, qnsq) — the serve-from-index form, where queries are not a
    * prefix of the corpus.
    */
  private def refineExactWith(e: DataFrame, qv: DataFrame,
      cand: DataFrame, k: Int): DataFrame = {
    import e.sparkSession.implicits._
    val scored = e.select($"vec_id".as("nid"), $"v", $"nsq")
      .join(broadcast(cand), Seq("nid"))
      .join(broadcast(qv), Seq("qid"))
      .select($"qid", $"nid",
        (dotQ($"qv", $"v").cast("double") /
          sqrt($"qnsq".cast("double")) /
          sqrt($"nsq".cast("double"))).as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid".asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
  }

  /** PQ top-k with a full-precision refine stage (FAISS
    * `IndexRefineFlat` + `k_factor`): [[cosineTopKPq]]'s ADC scan
    * selects each query's top k·kFactor candidates by approximate
    * cosine, then [[refineExact]] re-ranks them with exact integer dots
    * and keeps the top k. This closes the recall gap of the default
    * 12-bit codes (m=4·ksub=8; recall measured in bench_r12_sf1.json)
    * at a cost of nQueries·k·kFactor exact dots — corpus-size-
    * independent, so the scale shape stays the ADC scan's. Exact-integer
    * end-to-end: the DuckDB oracle is [[pqOracleSql]] with a refine
    * tail, a full replay, not a rows-only check.
    *
    * Defaults are the RETRIEVAL-grade geometry (m=8 × ksub=256 = 64-bit
    * codes, the FAISS standard; kFactor=16), not [[cosineTopKPq]]'s
    * 12-bit compression-primitive defaults: measured on the clustered
    * corpora (bench_r12_sf1.json), 12-bit codes lose the planted
    * duplicate 43% of the time at 20k vectors even WITH refine (the ADC
    * ranking can't surface it into the candidate set), while 64-bit
    * codes + refine hold dup-recall 1.0 at both scales.
    */
  def cosineTopKPqRefined(embeddings: DataFrame, nQueries: Int, k: Int,
      kFactor: Int = 16, m: Int = 8, ksub: Int = 256, iters: Int = 2,
      dims: Int = 64, trainFrac: Double = 1.0): DataFrame = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
    val books = pqTrain(e, m, ksub, iters, dims, trainFrac)
    if (books.exists(_.isEmpty))
      return e.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    val corpus = pqEncode(e, books, dims, cacheBase = true)
    val cand = pqScore(corpus, e.filter($"vec_id" < nQueries), books,
      k * kFactor, dims).select($"qid", $"nid")
    refineExact(e, cand, nQueries, k)
  }

  /** [[cosineTopKIvfPq]] with the same full-precision refine stage as
    * [[cosineTopKPqRefined]]: coarse pruning → ADC top k·kFactor →
    * exact re-rank to top k. The composed 100 TB serving shape with the
    * recall of a flat exact scan over the candidate set.
    */
  def cosineTopKIvfPqRefined(embeddings: DataFrame, nQueries: Int, k: Int,
      kFactor: Int = 16, nlist: Int = 16, nprobe: Int = 4, m: Int = 8,
      ksub: Int = 256, iters: Int = 2, dims: Int = 64,
      trainFrac: Double = 1.0): DataFrame = {
    import embeddings.sparkSession.implicits._
    val dbg = sys.props.contains("graft.debug.pq")
    var tM = System.nanoTime()
    def mark(tag: String): Unit = if (dbg) {
      val now = System.nanoTime()
      println(s"PQPHASE $tag ${(now - tM) / 1e9}"); tM = now
    }
    val e = quantized(embeddings)
    val cents = trainCentroidsSampled(e, nlist, iters, trainFrac)
    mark("coarse_train")
    val books = pqTrain(e, m, ksub, iters, dims, trainFrac)
    mark("pq_train")
    if (cents.isEmpty || books.exists(_.isEmpty))
      return e.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    val codes = pqEncode(e.withColumn("list_id", assignExpr(cents)),
      books, dims, extra = Seq("list_id"), cacheBase = true)
    val cand = pqScoreProbed(codes, e.filter($"vec_id" < nQueries), cents,
      books, k * kFactor, nprobe, dims).select($"qid", $"nid")
    refineExact(e, cand, nQueries, k)
  }

  /** RESIDUAL IVF-PQ with refine — the standard FAISS `IndexIVFPQ`
    * formulation (by_residual=true, IndexIVFPQ.cpp): the PQ codebooks
    * are trained on and encode r = v − c(list) rather than v itself.
    * Residuals have far less variance than raw vectors (the coarse
    * quantizer absorbs the between-cluster structure), so the same code
    * length quantizes them with less error — the whole reason FAISS
    * defaults to residual encoding. [[cosineTopKIvfPq]] documents its
    * non-residual simplification (nprobe=nlist ≡ flat PQ); this is the
    * full form.
    *
    * Serving stays ADC-shaped: x̂ = c + r̂, so
    *   ⟨q, x̂⟩ = ⟨q, c_list⟩ + Σₛ lutₛ[cₛ]
    * where the luts are the SAME per-query tables as the flat path
    * (the residual codebooks are global, not per-list — FAISS
    * likewise), and ⟨q, c_list⟩ is one extra dot per (query, probed
    * list) — nprobe rows per query, computed BEFORE the broadcast join,
    * never per code row. ‖x̂‖² = ‖c‖² + ‖r̂‖² + 2⟨c, r̂⟩ is exact-integer
    * and stored per code row at encode time (the ⟨c, r̂⟩ cross term
    * depends only on (list, codes)), so a served row still costs m
    * lookups + adds. Exact-integer end-to-end → a full DuckDB replay
    * ([[ivfPqResidualOracleSql]]), refine tail identical to
    * [[cosineTopKIvfPqRefined]].
    */
  def cosineTopKIvfPqResidualRefined(embeddings: DataFrame, nQueries: Int,
      k: Int, kFactor: Int = 16, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 256, iters: Int = 2, dims: Int = 64,
      trainFrac: Double = 1.0, knownN: Option[Long] = None): DataFrame = {
    import embeddings.sparkSession.implicits._
    val dbg = sys.props.contains("graft.debug.pq")
    var tM = System.nanoTime()
    def mark(tag: String): Unit = if (dbg) {
      val now = System.nanoTime()
      println(s"PQPHASE $tag ${(now - tM) / 1e9}"); tM = now
    }
    val e = quantized(embeddings)
    // Both trainers price their points-per-centroid cap against the
    // corpus size; count once here (or not at all when the caller —
    // cosineTopKAuto, which already counted for annParams — passes it)
    // instead of one count job per trainer.
    val n = knownN.getOrElse(e.count())
    val cents = trainCentroidsSampled(e, nlist, iters, trainFrac,
      knownN = Some(n))
    mark("coarse_train")
    if (cents.isEmpty)
      return e.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    val eRes = registry.cache(residualAssign(e, cents, dims))
    val books = pqTrain(eRes.select($"vec_id", $"rv".as("v")), m, ksub,
      iters, dims, trainFrac, knownN = Some(n))
    mark("pq_train")
    if (books.exists(_.isEmpty))
      return e.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    val codes = residualCodesFrom(eRes, cents, books, dims)
    if (dbg) { codes.queryExecution.toRdd.count(); mark("encode") }
    val cand = residualScore(codes, e.filter($"vec_id" < nQueries), cents,
      books, k * kFactor, nprobe, dims).select($"qid", $"nid")
    refineExact(e, cand, nQueries, k)
  }

  /** Residual assignment: (vec_id, v, nsq) → + (list_id, rv) where
    * rv = v − c(list), an exact integer zip_with subtraction against
    * the list's centroid.
    */
  private def residualAssign(e: DataFrame, cents: Seq[(Long, Array[Long])],
      dims: Int): DataFrame = {
    import e.sparkSession.implicits._
    import org.apache.spark.sql.functions.typedlit
    val (centVecs, _) = centDense(cents, dims)
    val cvOf = element_at(lit2dLong(centVecs), ($"list_id" + 1).cast("int"))
    e.withColumn("list_id", assignExpr(cents))
      .withColumn("rv", zip_with($"v", cvOf, (a, b) => a - b))
  }

  /** Encode a residual-assigned frame into the residual index's code
    * rows (vec_id, c0.., list_id, rnsq, xnsq): codes are per-subspace
    * argmins over rv, and xnsq carries the FULL reconstruction norm
    * ‖x̂‖² = ‖c_list‖² + ‖r̂‖² + 2·Σₛ⟨c_list slice s, cbₛ(cₛ)⟩ — exact
    * integers, stored so serving never recomputes cross terms.
    */
  private def residualCodesFrom(eRes: DataFrame,
      cents: Seq[(Long, Array[Long])],
      books: Seq[Seq[(Long, Array[Long])]], dims: Int): DataFrame = {
    import eRes.sparkSession.implicits._
    import org.apache.spark.sql.functions.typedlit
    val (centVecs, centNsq) = centDense(cents, dims)
    val cvOf = element_at(lit2dLong(centVecs), ($"list_id" + 1).cast("int"))
    val m = books.size
    val len = dims / m
    // The code columns are computed ONCE into the cache before xnsq is
    // derived: xnsq references every c$s (and rnsq, which also
    // references them), and CollapseProject would otherwise inline the
    // ksub=256 argmin into each reference — measured 4.5× the whole
    // encode (10.6 s vs 2.4 s at 20k). Reading xnsq off the cached
    // base is two O(1) lookups per subspace per scan.
    val base = pqEncode(eRes.select($"vec_id", $"rv".as("v"), $"list_id"),
      books, dims, extra = Seq("list_id"), cacheBase = true)
    // The cross term depends only on (list_id, code_s) and both factors
    // are index state, so the whole ⟨c_list slice s, cbₛ(k)⟩ table is
    // PREcomputed — nlist×ksub longs per subspace — and a code row pays
    // O(1) lookups per subspace. Per-row evaluation (pqLut, or even one
    // dot against literal-lookup centroids) measured 4–8× the entire
    // rest of the encode at ksub=256: nested literal indexing inside a
    // per-row expression re-walks the big constant, the precomputed
    // table never does. Delivery is size-adaptive:
    //  - small (≲34 MB of longs; covers √n coarse sizing to ~2M vectors
    //    at ~8 MB): one Literal per subspace, zero-join lookups;
    //  - large (nlist·Σksubₛ > [[crLiteralMaxEntries]]; √n sizing at
    //    10⁹ vectors is ~1 GB — too big for a plan-embedded constant or
    //    the driver heap): the table is computed DISTRIBUTEDLY from the
    //    parallelized centroid rows (books stay literal — m·ksub·len
    //    longs, ~130 KB) and broadcast-joined on list_id, flattened with
    //    per-subspace offsets. Entries are identical integers either way
    //    (one dot per (list, subspace, code) in both formulations).
    val width = cents.map(_._1).max.toInt + 1
    val ws = (0 until m).map(s => books(s).map(_._1).max.toInt + 1)
    val cnsqLookup =
      element_at(typedlit(centNsq), ($"list_id" + 1).cast("int"))
    if (width.toLong * ws.sum <= crLiteralMaxEntries) {
      val crTables: Seq[Seq[Seq[Long]]] = (0 until m).map { s =>
        val bk = bookDense(books(s), len)
        val tbl = Array.fill(width)(Seq.fill(bk.size)(0L))
        cents.foreach { case (cid, cv) =>
          val cs = cv.slice(s * len, s * len + len)
          tbl(cid.toInt) = bk.map(b =>
            (0 until len).map(i => cs(i) * b(i)).sum)
        }
        tbl.toSeq
      }
      val crdot = (0 until m).map(s =>
        element_at(
          element_at(lit2dLong(crTables(s)), ($"list_id" + 1).cast("int")),
          (col(s"c$s") + 1).cast("int")))
        .reduce(_ + _)
      base.withColumn("xnsq", cnsqLookup + $"rnsq" + lit(2L) * crdot)
    } else {
      val offs = ws.scanLeft(0)(_ + _)
      val centDf = eRes.sparkSession.createDataFrame(
        cents.map { case (cid, cv) => (cid, cv.toSeq) })
        .toDF("list_id", "cv")
      val crCols = (0 until m).map { s =>
        val bk = lit2dLong(bookDense(books(s), len))
        transform(sequence(lit(1), lit(ws(s))), kk =>
          dotQ(slice($"cv", s * len + 1, len), element_at(bk, kk)))
      }
      val crDf = centDf.select($"list_id", concat(crCols: _*).as("cr"))
      val crdot = (0 until m).map(s =>
        element_at($"cr", lit(offs(s)) + col(s"c$s").cast("int") + 1))
        .reduce(_ + _)
      base.join(broadcast(crDf), Seq("list_id"))
        .withColumn("xnsq", cnsqLookup + $"rnsq" + lit(2L) * crdot)
        .drop("cr")
    }
  }

  /** Max nlist·Σksubₛ entries shipped as per-subspace cross-term
    * Literals in [[residualCodesFrom]]; above this the table rides a
    * broadcast-joined DataFrame computed distributedly. Overridable for
    * tests (forcing the join path on small corpora) via the
    * `graft.cr.literal.max.entries` system property.
    */
  private def crLiteralMaxEntries: Long =
    sys.props.get("graft.cr.literal.max.entries").map(_.toLong)
      .getOrElse(1L << 22)

  /** Residual ADC top-k: raw full-precision queries — per (query,
    * probed list) the coarse dot ⟨q, c_list⟩ (computed on the nprobe
    * probe rows, BEFORE the broadcast join), per query the m global
    * residual luts; a code row costs m lookups + adds.
    */
  private def residualScore(codes: DataFrame, queries: DataFrame,
      cents: Seq[(Long, Array[Long])],
      books: Seq[Seq[(Long, Array[Long])]], k: Int, nprobe: Int,
      dims: Int): DataFrame = {
    import codes.sparkSession.implicits._
    import org.apache.spark.sql.functions.typedlit
    val (centVecs, _) = centDense(cents, dims)
    val m = books.size
    val len = dims / m
    // Same two-broadcast split as [[pqScoreProbed]] (see the scale note
    // there): only cent_dot genuinely varies per (query, probed list),
    // so it rides the 24-byte pair rows; the m per-query residual luts
    // and qnsq broadcast once per query, never per probe.
    val qPairs = queries
      .select($"vec_id".as("qid"), $"v".as("qv"),
        explode(probeExpr($"v", cents, nprobe)).as("list_id"))
      .withColumn("cent_dot", dotQ($"qv",
        element_at(lit2dLong(centVecs), ($"list_id" + 1).cast("int"))))
      .drop("qv")
    val qLuts = queries
      .select(($"vec_id".as("qid") +: $"nsq".as("qnsq") +:
        (0 until m).map(s => pqLut(slice($"v", s * len + 1, len), books(s))
          .as(s"lut$s"))): _*)
    val adot = $"cent_dot" + (0 until m).map(s =>
      lutAt(col(s"lut$s"), col(s"c$s"))).reduce(_ + _)
    val scored = codes.join(broadcast(qPairs), Seq("list_id"))
      .join(broadcast(qLuts), Seq("qid"))
      .filter($"vec_id" =!= $"qid")
      .select($"qid", $"vec_id".as("nid"),
        (adot.cast("double") / sqrt($"qnsq".cast("double")) /
          sqrt($"xnsq".cast("double"))).as("cos"))
    val w = Window.partitionBy($"qid").orderBy($"cos".desc, $"nid".asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= k)
  }

  /** Build the residual IVF-PQ index persistably — the by_residual
    * counterpart of [[ivfPqIndex]]: (cid, cv) centroids, (s, cid, cv)
    * residual codebooks, and (vec_id, c0.., list_id, rnsq, xnsq) code
    * rows, all plain parquet. xnsq makes the stored rows
    * self-sufficient for serving (no cross-term recomputation).
    */
  def ivfPqResidualIndex(embeddings: DataFrame, nlist: Int = 16,
      m: Int = 8, ksub: Int = 256, iters: Int = 2, dims: Int = 64,
      trainFrac: Double = 1.0): (DataFrame, DataFrame, DataFrame) = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
    val cents = trainCentroidsSampled(e, nlist, iters, trainFrac)
    val centDf = cents.map { case (cid, cv) => (cid, cv.toSeq) }
      .toDF("cid", "cv")
    if (cents.isEmpty) {
      val bookDf = Seq.empty[(Int, Long, Seq[Long])].toDF("s", "cid", "cv")
      // Placeholder book vectors must be SUBSPACE-LENGTH (here m=1, so
      // dims): the cross-term table is built eagerly on the driver and
      // indexes book vectors positionally — a 1-element stub would
      // throw before the filter(false) ever masks the rows.
      return (centDf, bookDf,
        residualCodesFrom(
          e.withColumn("list_id", lit(0L)).withColumn("rv", $"v"),
          Seq((0L, Array.fill(dims)(0L))),
          Seq(Seq((0L, Array.fill(dims)(0L)))),
          dims).filter(lit(false)))
    }
    val eRes = registry.cache(residualAssign(e, cents, dims))
    val books = pqTrain(eRes.select($"vec_id", $"rv".as("v")), m, ksub,
      iters, dims, trainFrac)
    val bookDf = books.zipWithIndex.flatMap { case (cs, s) =>
      cs.map { case (cid, cv) => (s, cid, cv.toSeq) }
    }.toDF("s", "cid", "cv")
    val codes =
      if (books.exists(_.isEmpty)) {
        // Subspace-length placeholders — see the cents.isEmpty note.
        val len = dims / math.max(1, books.size)
        residualCodesFrom(eRes, cents,
          Seq.fill(math.max(1, books.size))(
            Seq((0L, Array.fill(len)(0L)))), dims)
          .filter(lit(false))
      } else residualCodesFrom(eRes, cents, books, dims)
    (centDf, bookDf, codes)
  }

  /** Append into a stored [[ivfPqResidualIndex]] without retraining —
    * the residual counterpart of [[ivfPqAdd]]: assign to the stored
    * centroids, residualize, encode with the stored codebooks. The
    * same staleness story applies ([[ivfPqAddCost]]'s coarse half is
    * encoder-independent; rebuild input is the raw corpus).
    */
  def ivfPqResidualAdd(centroids: DataFrame, codebooks: DataFrame,
      vectors: DataFrame, dims: Int = 64): DataFrame = {
    import vectors.sparkSession.implicits._
    val cents = registry.collectOnce(centroids)
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    val books = collectBooks(codebooks)
    val e = vectors
      .select($"vec_id", quantize($"embedding").as("v"))
      .withColumn("nsq", normSqQ($"v"))
    if (cents.isEmpty || books.isEmpty || books.exists(_.isEmpty)) {
      // Subspace-length placeholders — see the ivfPqResidualIndex note.
      val len = dims / math.max(1, books.size)
      return residualCodesFrom(
        e.withColumn("list_id", lit(0L)).withColumn("rv", $"v"),
        Seq((0L, Array.fill(dims)(0L))),
        Seq.fill(math.max(1, books.size))(
          Seq((0L, Array.fill(len)(0L)))), dims)
        .filter(lit(false))
    }
    residualCodesFrom(residualAssign(e, cents, dims), cents, books, dims)
  }

  /** Serve refined cosine top-k from a stored [[ivfPqResidualIndex]]:
    * ADC candidates from the compressed code rows, exact re-rank
    * against the raw corpus pruned to candidates — the FAISS
    * `IndexRefineFlat` deployment shape, where the flat copy is the
    * parquet corpus itself (read back only for ≤ |queries|·k·kFactor
    * candidate rows via the broadcast semi-join). Queries are raw
    * (vec_id, embedding) rows; with identical index parameters the
    * results match the one-shot operator's.
    */
  def cosineTopKIvfPqResidualRefinedFromIndex(centroids: DataFrame,
      codebooks: DataFrame, codes: DataFrame, corpus: DataFrame,
      queries: DataFrame, k: Int, kFactor: Int = 16, nprobe: Int = 4,
      dims: Int = 64): DataFrame = {
    import queries.sparkSession.implicits._
    val cents = registry.collectOnce(centroids)
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .sortBy(_._1).toSeq
    val books = collectBooks(codebooks)
    val q = queries
      .select($"vec_id", quantize($"embedding").as("v"))
      .withColumn("nsq", normSqQ($"v"))
    if (cents.isEmpty || books.isEmpty || books.exists(_.isEmpty))
      return q.filter(lit(false)).select($"vec_id".as("qid"),
        $"vec_id".as("nid"), lit(0d).as("cos"), lit(0L).as("rk"))
    val cand = residualScore(codes, q, cents, books, k * kFactor, nprobe,
      dims).select($"qid", $"nid")
    refineExactWith(quantized(corpus),
      q.select($"vec_id".as("qid"), $"v".as("qv"), $"nsq".as("qnsq")),
      cand, k)
  }

  /** Per-vector banded hyperplane signatures as an array of per-band
    * buckets: element b packs the sign bits of planesPerBand hyperplane
    * dots (global plane index b·P+p, so band 0 with P planes equals
    * [[lshBucket]]'s single signature). Same exact-integer sign arithmetic
    * as [[lshBucket]], so the DuckDB oracle mirrors every bucket
    * bit-for-bit — computed by ONE native expression
    * (graft.functions.HyperplaneSig) instead of bands×planes separate
    * dot-vs-literal expressions, which dominated q59's runtime as
    * generated-code bulk. NULL vectors null-propagate (explode then drops
    * the row — a null embedding has no near-dups); any other dimension
    * count fails loudly inside the expression instead of bucketing on
    * partial data.
    */
  private[graft] def hyperplaneBandArr(v: Column, bands: Int, planesPerBand: Int,
      dims: Int): Column = {
    val planes = (0 until bands * planesPerBand).map { i =>
      (0 until dims).map(j =>
        detHash32Local(s"plane$i", j.toString) * 2L - 4294967296L)
    }
    graft.functions.VecExprs.hyperplaneSig(v, planes, planesPerBand, dims)
  }

  /** Choose (bands, planesPerBand) for [[cosineNearDups]] from corpus
    * size and the cosine threshold — the standard LSH parameter
    * selection:
    *
    *  - planes P ≈ log₂(n / targetBucket): expected bucket occupancy
    *    stays ≈ targetBucket as the corpus grows, so per-band candidate
    *    work is ~n·targetBucket — linear in n, never n²;
    *  - bands B from the hyperplane collision probability at the
    *    threshold, s = 1 − acos(minCos)/π: a pair at exactly minCos
    *    collides in ≥1 of B bands with probability 1−(1−s^P)^B ≥
    *    targetRecall (pairs above the threshold have higher recall);
    *  - if that B exceeds maxBands (low thresholds make s^P tiny — an
    *    inherent hyperplane-LSH tradeoff), planes shrink until the work
    *    multiplier fits: bigger buckets, fewer bands, recall preserved.
    *
    * Only (n, minCos, targetRecall) matter at a given scale; the result
    * feeds both the Spark plan and the SQL oracle builder so the two
    * can never disagree.
    */
  def lshParams(n: Long, minCos: Double, targetRecall: Double = 0.95,
      targetBucket: Long = 32, maxBands: Int = 64,
      maxPlanes: Int = 16): (Int, Int) = {
    require(minCos > -1.0 && minCos < 1.0, s"minCos out of (-1,1): $minCos")
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall out of (0,1): $targetRecall")
    val s = 1.0 - math.acos(minCos) / math.Pi
    var p = 1
    while (p < maxPlanes && (targetBucket << p) < n) p += 1
    def bandsFor(pp: Int): Int = math.max(1, math.ceil(
      math.log(1.0 - targetRecall) / math.log(1.0 - math.pow(s, pp))).toInt)
    while (p > 1 && bandsFor(p) > maxBands) p -= 1
    (math.min(bandsFor(p), maxBands), p)
  }

  /** Auto-selected IVF-PQ retrieval geometry — see [[annParams]]. */
  final case class AnnGeometry(nlist: Int, nprobe: Int, kFactor: Int,
      m: Int)

  /** Choose (nlist, nprobe, kFactor, m) for the refined IVF-PQ retrieval
    * path from corpus size, k, and a target recall@k — the [[lshParams]]
    * analog for the ANN family, so deployments state WHAT recall they
    * need instead of hand-picking index constants. The same geometry
    * feeds both the Spark plan and the SQL oracle builder, so the two
    * can never disagree.
    *
    * The selection, each constant fitted from the measured recall
    * surface on the clustered corpora at 2k and 20k vectors
    * (bench_r13_sf1.json §ann_recall; RecallProbe "sweep" mode
    * regenerates it):
    *
    *  - nlist ≈ √n (FAISS coarse sizing, as [[semanticNlist]]): balances
    *    the n·nlist assignment against the n/nlist·nprobe per-query scan.
    *  - m (code length) steps up with n: ADC ranking error displaces a
    *    true neighbor by ~n·P(|ε| > gap) positions, so at fixed code
    *    length the candidate set must grow ~linearly with n to hold
    *    recall — longer codes shrink ε instead. Measured: 64-bit codes
    *    (m=8) need candidates ≈ 2.5% of the corpus for ADC recall ≥
    *    0.95 (affordable at 2k, ruinous at 1e9), 128-bit (m=16) holds
    *    ≥ 0.98 at 0.25% already at 20k — so m=8 carries small corpora
    *    and m=16 takes over at 16k. (Past ~1e8, step again — m=32 or
    *    OPQ — by re-running the sweep; the structure, not the constant,
    *    is the contract.)
    *  - kFactor: candidates C = k·kFactor = max(32·k, cFrac·n), cFrac
    *    fitted per code length (0.025 at m=8, 0.005 at m=16) — the
    *    refine stage then re-ranks a set whose measured ADC recall is
    *    ~1, so composed recall reduces to the probe side's.
    *  - nprobe: inverted from the MEASURED probe-miss curve at
    *    f = nprobe/nlist (no analytic form fits its heavy tail —
    *    1−(1−f)^c over-predicts the tail at every constant c). The
    *    curve: recall {0.52, 0.72, 0.88, 1.0} at f {0.13, 0.27, 0.51,
    *    1.0} on the 2k corpus, {0.60, 0.77, 0.95, 1.0} at 20k;
    *    piecewise-linear inversion of the WORSE (2k) curve keeps the
    *    choice conservative at both scales.
    *
    * Composition is measured, not assumed: at kFactor holding ADC ≈ 1,
    * composed recall equals the probe curve (e.g. 2k, kf=64: np=23 →
    * 0.880 composed vs 0.880 probe-only), so inverting the probe curve
    * at the full target is sufficient. The oracle-facing contract stays
    * the family's usual one: the geometry is a pure deterministic
    * function of (n, k, targetRecall), pinned at the verify corpus size
    * for the static SQL replay.
    *
    * Above 4096 lists (n ≳ 16.7M at the √n sizing) corpus assignment
    * goes two-level automatically ([[assignExpr]]) — measured
    * recall-neutral at serve-grade nprobe (0.457 vs 0.453 at
    * nprobe=64/nlist=8192), and the curve inversion here is
    * conservative one scale beyond its fit data, so the fitted
    * constants stand; probing stays exact.
    */
  def annParams(n: Long, k: Int, targetRecall: Double = 0.9): AnnGeometry = {
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall out of (0,1): $targetRecall")
    require(k > 0, s"k must be positive: $k")
    val nlist = math.max(1L, math.min(1L << 16,
      math.ceil(math.sqrt(n.toDouble)).toLong)).toInt
    val m = if (n <= 16000) 8 else 16
    val cFrac = if (m >= 16) 0.005 else 0.025
    val cands = math.max(32L * k,
      math.min(n, math.ceil(cFrac * n.toDouble).toLong))
    val kFactor = math.max(1L, (cands + k - 1) / k).toInt
    val f = probeFraction(n, targetRecall)
    val nprobe = math.max(1, math.min(nlist, math.ceil(nlist * f).toInt))
    AnnGeometry(nlist, nprobe, kFactor, m)
  }

  /** nprobe/nlist fraction delivering `targetRecall`, inverted from the
    * MEASURED probe-miss curves (no analytic form fits their heavy
    * tails — 1−(1−f)^c over-predicts the tail at every constant c).
    *
    * The r13 inversion used only the 2k-corpus curve; measured at
    * 200k/2M it over-delivered by a widening margin (0.953/0.963 at
    * target 0.8, probing 39% of lists — serve cost ∝ nprobe, so ~2×
    * wall left on the table; the r14 efficiency note). The refit (r15)
    * anchors on the curves measured AT the upper decades — RecallProbe
    * `lowf` on the clustered corpora at the auto geometry (m and
    * kFactor exactly what annParams picks at that n, bench_r15_sf1.json
    * §annparams_refit) — and interpolates the required fraction in
    * log₁₀(n) between anchors:
    *
    *  - n ≤ 20k: the original conservative 2k curve, UNCHANGED — this
    *    pins the verify-corpus geometry (q99/q103 oracles replay n=500)
    *    and the 2k/20k probes exactly as before;
    *  - 20k → 200k → 2M: linear in log₁₀(n) between the anchor
    *    inversions; the upper-decade curves are inverted at
    *    target+0.03 (capped 0.98) — the conservative bias, kept but
    *    narrowed from the old curve's +0.15;
    *  - above 2M: the 2M inversion, clamped — recall at fixed f only
    *    improves with n on every measured pair of decades, so the last
    *    measured curve is the conservative bound.
    */
  private[operators] def probeFraction(n: Long, targetRecall: Double)
      : Double = {
    def invert(curve: Seq[(Double, Double)], r: Double): Double =
      curve.sliding(2).collectFirst {
        case Seq((f0, r0), (f1, r1)) if r <= r1 =>
          f0 + (r - r0) / (r1 - r0) * (f1 - f0)
      }.getOrElse(1.0)
    // Measured recall@3 at nprobe-fraction f, natural auto geometry.
    val curve2k = Seq((0.0, 0.0), (0.133, 0.517), (0.267, 0.717),
      (0.511, 0.880), (1.0, 1.0))
    val curve200k = Seq((0.0, 0.0), (0.0134, 0.223), (0.0268, 0.353),
      (0.0513, 0.467), (0.1004, 0.623), (0.2009, 0.840),
      (0.4018, 0.957), (1.0, 1.0))
    val curve2M = Seq((0.0, 0.0), (0.0127, 0.313), (0.0254, 0.470),
      (0.0502, 0.617), (0.1004, 0.770), (0.2, 0.870), (0.4, 0.967),
      (1.0, 1.0))
    val fSmall = invert(curve2k, targetRecall)
    if (n <= 20000) fSmall
    else {
      val padded = math.min(0.98, targetRecall + 0.03)
      val f200k = invert(curve200k, padded)
      val f2M = invert(curve2M, padded)
      val lg = math.log10(n.toDouble)
      val (lg20k, lg200k, lg2M) =
        (math.log10(2e4), math.log10(2e5), math.log10(2e6))
      val f =
        if (lg <= lg200k)
          fSmall + (lg - lg20k) / (lg200k - lg20k) * (f200k - fSmall)
        else if (lg <= lg2M)
          f200k + (lg - lg200k) / (lg2M - lg200k) * (f2M - f200k)
        else f2M
      // The interpolation can only SHRINK the fraction vs the small-n
      // curve (anchors are monotone in n on every measured target);
      // never exceed it.
      math.min(fSmall, f)
    }
  }

  /** [[cosineTopKIvfPqResidualRefined]] with the whole geometry derived
    * from the actual corpus size via [[annParams]] — the one-argument
    * retrieval entry point a pipeline calls: state k and the recall you
    * need, the index shape follows. Runs the RESIDUAL encoder — the
    * r15 default-choice adjudication (bench_r15_sf1.json
    * §encoder_default): at the natural annParams geometry residual
    * TIES direct encoding at every measured scale (0.837 == 0.837 at
    * 200k, 0.847 == 0.847 at 2M — the kFactor refine pool, not
    * encoding fidelity, sets recall there) with build wall equal
    * within host variance, while at forced narrow-refine geometries
    * residual measures up to +0.18 recall (r13 §residual_ivfpq). Equal
    * cost at the geometry we pick, strictly better at geometries a
    * caller might force, and FAISS by_residual parity — so residual
    * stays. The count is a cheap columnar action over the cached
    * quantized corpus (exactly [[cosineNearDupsAuto]]'s pattern).
    */
  def cosineTopKAuto(embeddings: DataFrame, nQueries: Int, k: Int,
      targetRecall: Double = 0.9, dims: Int = 64): DataFrame = {
    val n = quantized(embeddings).count()
    val g = annParams(n, k, targetRecall)
    cosineTopKIvfPqResidualRefined(embeddings, nQueries, k,
      kFactor = g.kFactor, nlist = g.nlist, nprobe = g.nprobe, m = g.m,
      ksub = 256, dims = dims, knownN = Some(n))
  }

  /** Embedding-cosine near-duplicate pairs: banded hyperplane LSH
    * blocking (candidate = same bucket in ANY of `bands` bands — the OR
    * construction, exactly [[Dedup.lshNearDups]]'s band-join shape) with
    * exact cosine verification, so false positives are impossible and
    * recall is tunable via (bands, planesPerBand) — see [[lshParams]].
    *
    * Scale shape: the signature explode is map-side (bands rows of three
    * longs per vector — vectors themselves are NOT replicated per band);
    * the (band, bucket) self-join is the only blocking shuffle, quadratic
    * only in per-band bucket occupancy (≈ targetBucket under
    * [[lshParams]]); candidates then fetch their two vectors by key and
    * verify. A pair colliding in k bands is verified k times (k ≤ bands)
    * and deduped after the threshold filter, where the output is tiny —
    * same multiplicity reasoning as Dedup.lshNearDups.
    */
  def cosineNearDups(embeddings: DataFrame, minCos: Double,
      bands: Int, planesPerBand: Int, dims: Int = 64): DataFrame = {
    import embeddings.sparkSession.implicits._
    val e = quantized(embeddings)
    val banded = registry.cache(e.select($"vec_id",
        posexplode(hyperplaneBandArr($"v", bands, planesPerBand, dims))
          .as(Seq("band", "bucket")))
      .select($"vec_id", $"band".cast("long").as("band"), $"bucket"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
    cand
      .join(e.select($"vec_id".as("vec_a"), $"v".as("va"), $"nsq".as("na")),
        "vec_a")
      .join(e.select($"vec_id".as("vec_b"), $"v".as("vb"), $"nsq".as("nb")),
        "vec_b")
      .select($"vec_a", $"vec_b",
        (dotQ($"va", $"vb").cast("double") /
          sqrt($"na".cast("double")) / sqrt($"nb".cast("double"))).as("cos"))
      .filter($"cos" >= minCos)
      .distinct()
  }

  /** [[cosineNearDups]] with (bands, planes) derived from the actual
    * corpus size via [[lshParams]] — the one-argument entry point a
    * pipeline calls; the count is a cheap columnar action over the cached
    * quantized corpus.
    */
  def cosineNearDupsAuto(embeddings: DataFrame, minCos: Double,
      targetRecall: Double = 0.95, dims: Int = 64): DataFrame = {
    val (b, p) = lshParams(quantized(embeddings).count(), minCos, targetRecall)
    cosineNearDups(embeddings, minCos, b, p, dims)
  }

  /** Embedding near-dup CLUSTERS: connected components over the
    * [[cosineNearDups]] pair graph with min-vec_id labels, cluster size,
    * and the keep-one-survivor flag — the cosine counterpart of
    * [[Dedup.nearDupClusters]] (q67), closing the embedding family from
    * pairs to an actual deduplicated corpus. Same bounded-driver
    * union-find / distributed min-label fixpoint adjudication via
    * [[Clusters.fromPairs]]; the pair set is cached, so the closure's
    * count+collect pays the LSH+verify pipeline once.
    */
  def cosineNearDupClusters(embeddings: DataFrame, minCos: Double,
      bands: Int, planesPerBand: Int, dims: Int = 64,
      unionFindMaxEdges: Long = 2_000_000): DataFrame = {
    import embeddings.sparkSession.implicits._
    val pairs = registry.cache(
      cosineNearDups(embeddings, minCos, bands, planesPerBand, dims)
        .select($"vec_a", $"vec_b"))
    Clusters.fromPairs(quantized(embeddings).select($"vec_id"), pairs,
      unionFindMaxEdges, registry)
  }

  /** SemDeDup-style semantic dedup (q92, after Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the corpus with the IVF coarse quantizer
    * (broadcast k-means, [[trainIvfCentroids]]), then WITHIN each
    * cluster drop every vector that has a ≥ minCos neighbor with a
    * smaller vec_id — a deterministic keep-lowest-id variant of the
    * paper's keep-one-per-group rule. Returns every vector with its
    * cluster and verdict: (vec_id, list_id, kept).
    *
    * This is the scale path near-dup when no LSH geometry fits. Two
    * corpus-sized costs trade against each other: centroid ASSIGNMENT is
    * n·nlist distance evaluations and the intra-cluster PRUNE is
    * Σ|cluster|² ≈ n²/nlist pair dots — [[semanticNlist]]'s √n sizing
    * makes both O(n^1.5) (measured: the linear-in-n sizing this replaced
    * ran 14× at 10× data; √n + the native ArgminCentroid assignment runs
    * 1.5× — bench_r11_sf1.json §q92). The self-join shuffles on list_id;
    * a skewed (hot) cluster is exactly the AQE skew-join case, and the
    * quantized vectors it moves are compact longs. Training runs on the
    * hash-cap half-sample by default; at corpus scales where n/2 still
    * dwarfs what Lloyd needs, pass the FAISS rule explicitly
    * (trainFrac ≈ min(1, 256·nlist/n)) — the oracle machinery replays
    * any fraction. All arithmetic is exact-integer (dot, norms) with
    * one final double division — the identical contract as the rest of
    * the family, so the Lloyd replay + EXISTS oracle matches
    * bit-for-bit.
    */
  def semanticDedup(embeddings: DataFrame, minCos: Double): DataFrame = {
    val nlist = semanticNlist(quantized(embeddings).count())
    // iters/trainFrac are fixed here ON PURPOSE (2 Lloyd passes, hash-cap
    // half-sample training): the auto entry point deliberately takes NO
    // defaulted Int/Double knobs after minCos, so a legacy positional
    // call like semanticDedup(e, 0.35, 64) — which once meant nlist=64 —
    // fails to compile instead of silently re-interpreting the argument.
    // Explicit geometry goes through semanticDedupAt.
    semanticDedupAt(embeddings, minCos, nlist, iters = 2, trainFrac = 0.5)
  }

  /** FAISS-style cluster-count sizing for [[semanticDedup]]:
    * nlist ≈ √n balances the two corpus-sized costs against each other —
    * centroid ASSIGNMENT is n·nlist distance evaluations and the
    * intra-cluster PRUNE is Σ|cluster|² ≈ n²/nlist pair dots, so √n makes
    * both O(n^1.5); any sizing linear in n turns assignment quadratic
    * (measured: n/16 sizing ran 14× at 10× data — the 81 s q92 probe —
    * vs sublinear-in-output at √n). The same derive-geometry-from-n
    * pattern as [[lshParams]]; the static oracle pins the value this
    * returns at the verify corpus size.
    */
  def semanticNlist(n: Long): Int =
    math.max(1L, math.min(1L << 16,
      math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** [[semanticDedup]] at an explicit cluster count — the core both the
    * auto-sized entry point and the nlist-sweep probes call. Training is
    * hash-cap sampled ([[trainCentroidsSampled]]) so index-build cost is
    * bounded by the sample, not the corpus; assignment and the
    * intra-cluster prune still see every vector.
    *
    * Hot-cluster guard (capFactor > 0): √n sizing balances EXPECTED
    * costs, but a skewed corpus can put ~n vectors in one cluster and
    * make the intra-cluster prune quadratic no matter what AQE does to
    * the shuffle. Lists over capFactor × mean size are therefore split
    * before the prune, hierarchically:
    *   1. k-means rounds (≤3): members of all oversized lists are
    *      re-clustered together with ⌈2·|hot|/cap⌉ fresh centroids
    *      (same hash-seeded integer Lloyd; sub-list ids start above the
    *      parent id space, so ids stay unique and deterministic).
    *   2. Lists k-means cannot separate — near-identical mass, where
    *      every seed collapses to the same centroid and the argmin ties
    *      to one cid — are salted into ⌈size/cap⌉ chunks on vec_id
    *      modulo (any chunking co-locates duplicates there, BECAUSE the
    *      vectors are near-identical), and after the intra-list prune
    *      the per-chunk survivors of each salted parent are compared in
    *      one extra merge pass (≤ chunk-count survivors each for
    *      near-identical mass), restoring the unsplit keep-set.
    * Work is then Σ|list|² ≤ n·cap ≈ capFactor·n^1.5 at √n sizing — the
    * designed budget — instead of n². The census that sizes the lists
    * also prices the prune: when the actual Σ|list|² is ALREADY within
    * the n·cap budget the guard exits before any split work, so on
    * balanced corpora (where it has nothing to fix) it costs one
    * aggregate over the cached assignment and nothing else. The guard's
    * driver state is one (list_id, count) aggregate per round, ≤ #lists
    * rows. At the pinned
    * q92 oracle geometry the guard never fires (cap = 8× mean; an iid
    * corpus peaks near 2× mean), so the static replay stays valid;
    * capFactor = 0 disables the guard outright. Split lists report
    * their final (sub-list / chunk) id in the output's list_id.
    *
    * Above 4096 lists (`graft.hier.assign.min.lists`) the corpus
    * assignment inside this operator goes two-level automatically —
    * see [[ivfIndex]]'s note; cluster membership near group boundaries
    * can then differ from a flat run at the same nlist, which moves
    * WHICH near-identical pair shares a list, not whether the kept
    * representative is deterministic.
    */
  def semanticDedupAt(embeddings: DataFrame, minCos: Double,
      nlist: Int, iters: Int = 2, trainFrac: Double = 1.0,
      capFactor: Int = 8, subTrainPpc: Int = 256,
      guardMinPairs: Long = 1L << 26): DataFrame = {
    import embeddings.sparkSession.implicits._
    import org.apache.spark.sql.functions.typedlit
    val e = quantized(embeddings)
    val cents = trainCentroidsSampled(e, nlist, iters, trainFrac)
    if (cents.isEmpty)
      return e.filter(lit(false)).select($"vec_id",
        lit(0L).as("list_id"), lit(true).as("kept"))
    var asg = e.withColumn("list_id", assignExpr(cents))
      .withColumn("parent_id", lit(null).cast("long"))
    var saltedAny = false
    if (capFactor > 0) {
      // Materialize the assignment RECOVERABLY: the guard reads it
      // several times (size census, hot filters, the final prune join),
      // and without materialization every read re-runs the n·nlist
      // argmin — measured 1.7× SLOWER guarded than unguarded at 200k
      // vectors before this. The base assignment goes through
      // registry.cache (persist) rather than localCheckpoint so an
      // executor loss recomputes the block instead of failing the
      // operator; the census aggregate below forces it. Only the
      // intra-guard reassign/salt stages — where lineage would re-run
      // the argmin per round — still localCheckpoint. Data is
      // unchanged, so the q92 oracle and IvfSpec keep-sets are
      // untouched.
      val dbg = sys.props.contains("graft.debug.semdedup")
      var tMark = System.nanoTime()
      def mark(tag: String): Unit = if (dbg) {
        val now = System.nanoTime()
        println(s"SEMDEDUP $tag ${(now - tMark) / 1e9}")
        tMark = now
      }
      asg = registry.cache(asg)
      def sizesOf(df: DataFrame): Array[(Long, Long)] =
        df.groupBy("list_id").count().collect()
          .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      var sizes = sizesOf(asg)
      mark("assign_census")
      val n = sizes.map(_._2).sum
      val cap = math.max(2L,
        capFactor.toLong * math.max(1L, n / math.max(1, nlist)))
      // Early exit: the guard exists to bound the intra-list prune, and
      // the census that sizes the lists also prices it — Σ|list|² pair
      // dots. Skip the split machinery entirely when that work is
      // affordable, on either criterion:
      //  - RELATIVE: Σ|list|² ≤ n·cap, the designed n^1.5 budget — the
      //    prune is already within what the guard would bound it to.
      //    (Σ|l|² > n·cap implies some list exceeds cap, since
      //    Σ|l|² ≤ cap·Σ|l| otherwise — the loop always has work when
      //    entered.)
      //  - ABSOLUTE: Σ|list|² ≤ guardMinPairs (default 2²⁶ ≈ 67M pairs,
      //    a few seconds of 64-dim integer dots on one executor). The
      //    guard's own fixed cost is ~8 s of split rounds + checkpoints
      //    (bench_r12_sf1.json: guarded 9.8 s vs unguarded 1.6 s on the
      //    2k hot corpus, where the whole quadratic is 2.25M pairs) —
      //    below this floor splitting cannot win even when the budget
      //    is formally exceeded. 0 forces the budget-only criterion
      //    (the IvfSpec planted-hot test exercises the split machinery
      //    at test scale this way).
      val pairWork = sizes.map(s => s._2 * s._2).sum
      var hot =
        if (pairWork <= math.max(n * cap, guardMinPairs))
          Array.empty[(Long, Long)]
        else sizes.filter(_._2 > cap)
      var base = nlist.toLong
      var round = 0
      while (hot.nonEmpty && round < 3) {
        val hotIds = hot.map(_._1).toSet
        val kSub = math.max(2, math.min(1 << 14,
          math.ceil(2.0 * hot.map(_._2).sum / cap).toInt))
        val hotDf = asg.filter($"list_id".isInCollection(hotIds))
          .select($"vec_id", $"v", $"nsq")
        // FAISS's points-per-centroid heuristic: k-means quality
        // saturates around ~256 training points per centroid, so the
        // split round trains on at most subTrainPpc·kSub rows however
        // large the hot mass — the sub-clustering is a splitting
        // heuristic, not the keep-set (exact pair verification decides
        // that). NOTE: once |hot| > subTrainPpc·kSub the sub-cluster
        // boundaries — and so which near-dup pairs get COMPARED —
        // depend on the training subsample; the keep-set is approximate
        // by design at those scales, and subTrainPpc is exposed so
        // deployments can pin it for reproducibility. An empty sample
        // falls back to the full hot mass inside trainCentroidsSampled.
        val subCents = trainCentroidsSampled(hotDf, kSub, iters,
          trainFrac, ppc = subTrainPpc,
          knownN = Some(hot.map(_._2).sum))
        mark(s"subtrain_r$round")
        if (subCents.isEmpty) round = 3
        else {
          asg = asg.filter(!$"list_id".isInCollection(hotIds))
            .unionByName(hotDf
              .withColumn("list_id", assignExpr(subCents) + lit(base))
              .withColumn("parent_id", lit(null).cast("long")))
            .localCheckpoint()
          mark(s"reassign_r$round")
          base += kSub
          round += 1
          sizes = sizesOf(asg)
          val prev = hot.map(_._2).sorted.toSeq
          hot = sizes.filter(_._2 > cap)
          // No progress (identical mass: every sub-seed collapses to the
          // same centroid and the argmin ties to one cid, reproducing
          // the same oversized lists) — stop burning Lloyd rounds and
          // go straight to the salting fallback.
          if (hot.map(_._2).sorted.toSeq == prev) round = 3
        }
      }
      if (hot.nonEmpty) {
        // k-means-inseparable remainder: modulo-salt into ⌈size/cap⌉
        // chunks, remembering the parent for the survivor-merge pass.
        val chunkOf = hot.map { case (id, sz) =>
          id -> math.max(2L, (sz + cap - 1L) / cap) }.toMap
        var off = base
        val offOf = hot.map { case (id, _) =>
          val o = off; off += chunkOf(id); id -> o }.toMap
        val hotIds = hot.map(_._1).toSet
        asg = asg.filter(!$"list_id".isInCollection(hotIds))
          .unionByName(asg.filter($"list_id".isInCollection(hotIds))
            .withColumn("parent_id", $"list_id")
            .withColumn("list_id", element_at(typedlit(offOf), $"list_id") +
              $"vec_id" % element_at(typedlit(chunkOf), $"list_id")))
          .localCheckpoint()
        mark("salt")
        saltedAny = true
      }
    }
    // capFactor > 0 ⟹ asg is already materialized: the registry-cached
    // base assignment when the guard never split, or the last intra-guard
    // localCheckpoint when it did — persisting again would double its
    // residency (the r12 ADVICE finding). capFactor == 0 skips the guard
    // block entirely, so the prune's two self-join reads still need one
    // recoverable materialization.
    val assigned = if (capFactor > 0) asg else registry.cache(asg)
    def simPairs(df: DataFrame, key: String): DataFrame =
      df.as("x").join(df.as("y"),
          col(s"x.$key") === col(s"y.$key") &&
            col("x.vec_id") < col("y.vec_id"))
        .filter((dotQ(col("x.v"), col("y.v")).cast("double") /
          sqrt(col("x.nsq").cast("double")) /
          sqrt(col("y.nsq").cast("double"))) >= minCos)
        .select(col("y.vec_id").as("vec_id")).distinct()
    val intraDropped = simPairs(assigned, "list_id")
    val dropped =
      if (!saltedAny) intraDropped
      else {
        // Survivors of salted chunks re-compared within their parent:
        // near-identical mass leaves ~1 survivor per chunk, so this pass
        // is (chunks per parent)² pairs — and it restores the unsplit
        // keep-set (the chunk minima all collapse to the parent minimum).
        val survivors = assigned.filter($"parent_id".isNotNull)
          .join(intraDropped, Seq("vec_id"), "left_anti")
        intraDropped.union(simPairs(survivors, "parent_id")).distinct()
      }
    assigned.join(dropped.withColumn("hit", lit(true)), Seq("vec_id"), "left")
      .select($"vec_id", $"list_id", $"hit".isNull.as("kept"))
  }

  /** DuckDB replay of [[cosineTopKIvf]]: the Lloyd iterations unrolled as
    * CTE chains over the unnested (vec_id, i, val) relation.
    */
  /** The WITH-chain shared by every oracle that replays the broadcast
    * k-means assignment ([[ivfOracleSql]], [[semanticDedupOracleSql]]):
    * quantized vectors `e`/`u`/`n`, optional hash-cap training sample,
    * seeds, `iters` unrolled Lloyd iterations, and the final tables
    * `cn<iters>`/`dt<iters>`/`asgF` (assignment of every vector).
    */
  private def ivfAssignCtes(nlist: Int, iters: Int,
      trainFrac: Double): String = {
    val seedU = detUniformSql("ivfseed", "vec_id")
    val sampled = trainFrac < 1.0
    // Training rows: the SAME integer hash-cap membership test as
    // trainCentroidsSampled — seeds and Lloyd iterations see only `ut`,
    // the final assignment (dtF/asgF) sees all of `u`.
    val trainCtes = if (!sampled) Nil else Seq(
      s"""tr AS (SELECT vec_id FROM e
         |  WHERE ${detHash32Sql("ivftrain", "vec_id")} < ${trainHashCap(trainFrac)})""".stripMargin,
      "ut AS (SELECT u.* FROM u JOIN tr USING (vec_id))")
    val seedSrc = if (sampled) "tr" else "e"
    val trainSrc = if (sampled) "ut" else "u"
    def cn(t: Int) =
      s"cn$t AS (SELECT cid, CAST(SUM(cval * cval) AS BIGINT) AS cnsq FROM c$t GROUP BY cid)"
    def dt(t: Int, src: String = "u") =
      s"""dt$t AS (
         |  SELECT u.vec_id, c.cid, CAST(SUM(u.val * c.cval) AS BIGINT) AS dot
         |  FROM $src u JOIN c$t c ON c.i = u.i GROUP BY 1, 2)""".stripMargin
    def asg(t: Int, name: String) =
      s"""$name AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT d.vec_id, d.cid,
         |      ROW_NUMBER() OVER (PARTITION BY d.vec_id
         |        ORDER BY (n.nsq + cn.cnsq - 2 * d.dot) ASC, d.cid ASC) AS arn
         |    FROM dt$t d
         |    JOIN n ON n.vec_id = d.vec_id
         |    JOIN cn$t cn ON cn.cid = d.cid)
         |  WHERE arn = 1)""".stripMargin
    def cNext(t: Int) =
      s"""c${t + 1} AS (
         |  SELECT a.cid, u.i,
         |    CAST(FLOOR(CAST(SUM(u.val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cval
         |  FROM asg${t + 1} a JOIN u ON u.vec_id = a.vec_id
         |  GROUP BY a.cid, u.i)""".stripMargin
    val iterCtes = (0 until iters).flatMap { t =>
      Seq(cn(t), dt(t, trainSrc), asg(t, s"asg${t + 1}"), cNext(t))
    }
    val f = iters // final centroid table index
    val trainPrefix =
      if (sampled) trainCtes.mkString("", ",\n", ",\n") else ""
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)) AS v
       |  FROM embeddings),
       |u AS (
       |  SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS i FROM e),
       |n AS (
       |  SELECT vec_id, CAST(SUM(val * val) AS BIGINT) AS nsq FROM u GROUP BY vec_id),
       |${trainPrefix}seed AS (
       |  SELECT vec_id, CAST(rn - 1 AS BIGINT) AS cid FROM (
       |    SELECT vec_id,
       |      ROW_NUMBER() OVER (ORDER BY $seedU ASC, vec_id ASC) AS rn
       |    FROM $seedSrc) WHERE rn <= $nlist),
       |c0 AS (
       |  SELECT s.cid, u.i, u.val AS cval
       |  FROM seed s JOIN u ON u.vec_id = s.vec_id),
       |${iterCtes.mkString(",\n")},
       |${cn(f)},
       |${dt(f)},
       |${asg(f, "asgF")}""".stripMargin
  }

  /** DuckDB replay of [[semanticDedup]]: the shared Lloyd chain to
    * `asgF`, then intra-cluster pair dots and the keep-lowest-id rule
    * as a LEFT JOIN against the dropped set. The oracle enumerates ALL
    * intra-cluster pairs — the Spark side does the same (no prefix or
    * LSH pruning inside a cluster), so the sets are identical, not
    * merely recall-equivalent.
    */
  private def semanticDedupOracleSql(minCos: String, nlist: Int,
      iters: Int, trainFrac: Double = 1.0): String =
    s"""${ivfAssignCtes(nlist, iters, trainFrac)},
       |pr AS (
       |  SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM asgF a JOIN asgF b ON a.cid = b.cid AND a.vec_id < b.vec_id),
       |pd AS (
       |  SELECT p.va, p.vb, CAST(SUM(x.val * y.val) AS BIGINT) AS dot
       |  FROM pr p
       |  JOIN u x ON x.vec_id = p.va
       |  JOIN u y ON y.vec_id = p.vb AND y.i = x.i
       |  GROUP BY 1, 2),
       |drp AS (
       |  SELECT DISTINCT vb AS vec_id FROM pd
       |  JOIN n na ON na.vec_id = va JOIN n nb ON nb.vec_id = vb
       |  WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE))
       |      / sqrt(CAST(nb.nsq AS DOUBLE)) >= CAST($minCos AS DOUBLE))
       |SELECT a.vec_id, a.cid AS list_id, (d.vec_id IS NULL) AS kept
       |FROM asgF a LEFT JOIN drp d ON d.vec_id = a.vec_id""".stripMargin

  private def ivfOracleSql(nQueries: Int, k: Int, nlist: Int, nprobe: Int,
      iters: Int, trainFrac: Double = 1.0): String = {
    val f = iters
    s"""${ivfAssignCtes(nlist, iters, trainFrac)},
       |probes AS (
       |  SELECT vec_id AS qid, cid FROM (
       |    SELECT d.vec_id, d.cid,
       |      ROW_NUMBER() OVER (PARTITION BY d.vec_id
       |        ORDER BY (n.nsq + cn.cnsq - 2 * d.dot) ASC, d.cid ASC) AS pr
       |    FROM dt$f d
       |    JOIN n ON n.vec_id = d.vec_id
       |    JOIN cn$f cn ON cn.cid = d.cid
       |    WHERE d.vec_id < $nQueries)
       |  WHERE pr <= $nprobe),
       |cand AS (
       |  SELECT p.qid, a.vec_id AS nid
       |  FROM probes p JOIN asgF a ON a.cid = p.cid AND a.vec_id <> p.qid),
       |pd AS (
       |  SELECT c.qid, c.nid, CAST(SUM(a.val * b.val) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN u a ON a.vec_id = c.qid
       |  JOIN u b ON b.vec_id = c.nid AND b.i = a.i
       |  GROUP BY 1, 2),
       |cosv AS (
       |  SELECT qid, nid,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE)) / sqrt(CAST(nb.nsq AS DOUBLE)) AS cos
       |  FROM pd JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid)
       |SELECT qid, nid, cos, rk FROM (
       |  SELECT qid, nid, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, nid ASC) AS BIGINT) AS rk
       |  FROM cosv) WHERE rk <= $k""".stripMargin
  }

  /** DuckDB replay of [[cosineTopKPq]]: the per-subspace Lloyd chains
    * unrolled like [[ivfOracleSql]], then ADC scoring as joins of the
    * corpus code table against per-query per-subspace dot tables. One
    * shared seed CTE (seeds rank on vec_id's hash only); training
    * assignment orders by (cnsq − 2·dot, cid) — the same argmin as the
    * full squared-L2 because the per-vector norm term is rank-constant.
    */
  /** The per-subspace Lloyd chains shared by [[pqOracleSql]] and
    * [[ivfPqOracleSql]]: for each subspace s, the sliced relation u$s,
    * seed centroids c${s}_0 (joining `seedName` — the ≤ksub seed rows),
    * `iters` unrolled iterations, and the finals cn${s}_f / dt${s}_f /
    * asgF$s (every vector's code in subspace s).
    */
  private def pqSubCtes(m: Int, ksub: Int, iters: Int, dims: Int,
      seedName: String, srcU: String = "u"): String = {
    val len = dims / m
    def sub(s: Int): Seq[String] = {
      val off = s * len
      def cn(t: Int) =
        s"cn${s}_$t AS (SELECT cid, CAST(SUM(cval * cval) AS BIGINT) AS cnsq FROM c${s}_$t GROUP BY cid)"
      def dt(t: Int) =
        s"""dt${s}_$t AS (
           |  SELECT u.vec_id, c.cid, CAST(SUM(u.val * c.cval) AS BIGINT) AS dot
           |  FROM u$s u JOIN c${s}_$t c ON c.i = u.i GROUP BY 1, 2)""".stripMargin
      def asg(t: Int, name: String) =
        s"""$name AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT d.vec_id, d.cid,
           |      ROW_NUMBER() OVER (PARTITION BY d.vec_id
           |        ORDER BY (cn.cnsq - 2 * d.dot) ASC, d.cid ASC) AS arn
           |    FROM dt${s}_$t d JOIN cn${s}_$t cn ON cn.cid = d.cid)
           |  WHERE arn = 1)""".stripMargin
      def cNext(t: Int) =
        s"""c${s}_${t + 1} AS (
           |  SELECT a.cid, u.i,
           |    CAST(FLOOR(CAST(SUM(u.val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cval
           |  FROM asg${s}_${t + 1} a JOIN u$s u ON u.vec_id = a.vec_id
           |  GROUP BY a.cid, u.i)""".stripMargin
      val head = Seq(
        s"u$s AS (SELECT vec_id, val, i - $off AS i FROM $srcU WHERE i > $off AND i <= ${off + len})",
        s"""c${s}_0 AS (
           |  SELECT sd.cid, u.i, u.val AS cval
           |  FROM $seedName sd JOIN u$s u ON u.vec_id = sd.vec_id)""".stripMargin)
      val its = (0 until iters).flatMap(t =>
        Seq(cn(t), dt(t), asg(t, s"asg${s}_${t + 1}"), cNext(t)))
      val f = iters
      head ++ its ++ Seq(cn(f), dt(f), asg(f, s"asgF$s"))
    }
    (0 until m).flatMap(sub).mkString(",\n")
  }

  /** The shared final SELECT of the PQ-family oracles: rank `scored`'s
    * ADC cosines and cut at k.
    */
  private def adcTopKTail(k: Int): String =
    s"""SELECT qid, nid, cos, rk FROM (
       |  SELECT qid, nid, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, nid ASC) AS BIGINT) AS rk
       |  FROM scored) WHERE rk <= $k""".stripMargin

  /** The refine tail ([[refineExact]]'s replay): cut `scored` at the
    * candidate count r, re-score each pair with exact integer dots over
    * `u`/`n` (the same CTEs every PQ oracle already carries), rank the
    * exact cosines and cut at k. Starts with the continuation comma —
    * appended where [[adcTopKTail]] would otherwise go.
    */
  private def refineTailSql(k: Int, r: Int): String =
    s""",
       |cand AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid,
       |      ROW_NUMBER() OVER (PARTITION BY qid
       |        ORDER BY cos DESC, nid ASC) AS crn
       |    FROM scored) WHERE crn <= $r),
       |rd AS (
       |  SELECT c.qid, c.nid, CAST(SUM(a.val * b.val) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN u a ON a.vec_id = c.qid
       |  JOIN u b ON b.vec_id = c.nid AND b.i = a.i
       |  GROUP BY 1, 2),
       |rc AS (
       |  SELECT rd.qid, rd.nid,
       |    CAST(rd.dot AS DOUBLE) / sqrt(CAST(qn.nsq AS DOUBLE))
       |      / sqrt(CAST(nn.nsq AS DOUBLE)) AS cos
       |  FROM rd JOIN n qn ON qn.vec_id = rd.qid
       |  JOIN n nn ON nn.vec_id = rd.nid)
       |SELECT qid, nid, cos, rk FROM (
       |  SELECT qid, nid, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, nid ASC) AS BIGINT) AS rk
       |  FROM rc) WHERE rk <= $k""".stripMargin

  private def pqOracleSql(nQueries: Int, k: Int, m: Int, ksub: Int,
      iters: Int, dims: Int, refine: Option[Int] = None): String = {
    val seedU = detUniformSql("ivfseed", "vec_id")
    val codeJoin = (1 until m).map(s =>
      s"JOIN asgF$s a$s USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(s => s"a$s.cid AS c$s").mkString(", ")
    val qdCtes = (0 until m).map(s =>
      s"qd$s AS (SELECT vec_id AS qid, cid, dot FROM dt${s}_$iters WHERE vec_id < $nQueries)")
    val dJoins = (1 until m).map(s =>
      s"JOIN qd$s d$s ON d$s.qid = d0.qid AND d$s.cid = x.c$s").mkString("\n  ")
    val rJoins = (0 until m).map(s =>
      s"JOIN cn${s}_$iters r$s ON r$s.cid = x.c$s").mkString("\n  ")
    val adot = (0 until m).map(s => s"d$s.dot").mkString(" + ")
    val rn = (0 until m).map(s => s"r$s.cnsq").mkString(" + ")
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)) AS v
       |  FROM embeddings),
       |u AS (
       |  SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS i FROM e),
       |n AS (
       |  SELECT vec_id, CAST(SUM(val * val) AS BIGINT) AS nsq FROM u GROUP BY vec_id),
       |seed AS (
       |  SELECT vec_id, CAST(rn - 1 AS BIGINT) AS cid FROM (
       |    SELECT vec_id,
       |      ROW_NUMBER() OVER (ORDER BY $seedU ASC, vec_id ASC) AS rn
       |    FROM e) WHERE rn <= $ksub),
       |${pqSubCtes(m, ksub, iters, dims, "seed")},
       |${qdCtes.mkString(",\n")},
       |codes AS (
       |  SELECT a0.vec_id, $codeCols
       |  FROM asgF0 a0 $codeJoin),
       |scored AS (
       |  SELECT d0.qid, x.vec_id AS nid,
       |    CAST(($adot) AS DOUBLE)
       |      / sqrt(CAST(qn.nsq AS DOUBLE))
       |      / sqrt(CAST(($rn) AS DOUBLE)) AS cos
       |  FROM codes x
       |  JOIN qd0 d0 ON d0.cid = x.c0
       |  $dJoins
       |  $rJoins
       |  JOIN n qn ON qn.vec_id = d0.qid
       |  WHERE x.vec_id <> d0.qid)${refine.map(refineTailSql(k, _))
        .getOrElse("\n" + adcTopKTail(k))}""".stripMargin
  }

  /** DuckDB replay of [[cosineNearDupsFromIndex]] over an [[ivfIndex]]
    * built in the same statement: the shared Lloyd chain to asgF, the
    * probes CTE for the batch (vec_id < nQueries), then pair dots with a
    * threshold filter instead of a rank window.
    */
  private def ivfServeOracleSql(nQueries: Int, minCosSql: String,
      nlist: Int, nprobe: Int, iters: Int): String =
    s"""${ivfServeCtes(nQueries, nlist, nprobe, iters)}
       |SELECT qid AS vec_id, nid AS dup_of, cos FROM embcos
       |WHERE cos >= CAST($minCosSql AS DOUBLE)""".stripMargin

  /** The CTE chain of [[ivfServeOracleSql]] without its final SELECT,
    * ending in embcos(qid, nid, cos) — every exact pair cosine the IVF
    * probe of queries vec_id < nQueries surfaces. Shared with the gate
    * cascade oracle ([[IngestGate.oracles]]), whose embedding tier is
    * exactly this relation thresholded.
    */
  private[operators] def ivfServeCtes(nQueries: Int, nlist: Int,
      nprobe: Int, iters: Int): String = {
    val f = iters
    s"""${ivfAssignCtes(nlist, iters, 1.0)},
       |probes AS (
       |  SELECT vec_id AS qid, cid FROM (
       |    SELECT d.vec_id, d.cid,
       |      ROW_NUMBER() OVER (PARTITION BY d.vec_id
       |        ORDER BY (n.nsq + cn.cnsq - 2 * d.dot) ASC, d.cid ASC) AS pr
       |    FROM dt$f d
       |    JOIN n ON n.vec_id = d.vec_id
       |    JOIN cn$f cn ON cn.cid = d.cid
       |    WHERE d.vec_id < $nQueries)
       |  WHERE pr <= $nprobe),
       |cand AS (
       |  SELECT p.qid, a.vec_id AS nid
       |  FROM probes p JOIN asgF a ON a.cid = p.cid AND a.vec_id <> p.qid),
       |pd AS (
       |  SELECT c.qid, c.nid, CAST(SUM(a.val * b.val) AS BIGINT) AS dot
       |  FROM cand c
       |  JOIN u a ON a.vec_id = c.qid
       |  JOIN u b ON b.vec_id = c.nid AND b.i = a.i
       |  GROUP BY 1, 2),
       |embcos AS (
       |  SELECT qid, nid,
       |    CAST(dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE))
       |      / sqrt(CAST(nb.nsq AS DOUBLE)) AS cos
       |  FROM pd JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid)""".stripMargin
  }

  /** DuckDB replay of [[cosineTopKIvfPq]] — the composition of the two
    * existing oracle builders: [[ivfAssignCtes]] supplies the coarse
    * Lloyd chain (e/u/n/seed…asgF + the finals cn/dt the probe CTE
    * reads), a second seed CTE `pseed` ranks the same hash order cut at
    * ksub, [[pqSubCtes]] supplies the per-subspace chains, and scoring is
    * [[pqOracleSql]]'s ADC joins restricted to each query's probed lists.
    */
  private def ivfPqOracleSql(nQueries: Int, k: Int, nlist: Int, nprobe: Int,
      m: Int, ksub: Int, iters: Int, dims: Int,
      refine: Option[Int] = None): String = {
    val f = iters
    val seedU = detUniformSql("ivfseed", "vec_id")
    val qdCtes = (0 until m).map(s =>
      s"qd$s AS (SELECT vec_id AS qid, cid, dot FROM dt${s}_$iters WHERE vec_id < $nQueries)")
    val codeJoin = (1 until m).map(s =>
      s"JOIN asgF$s a$s USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(s => s"a$s.cid AS c$s").mkString(", ")
    val dJoins = (1 until m).map(s =>
      s"JOIN qd$s d$s ON d$s.qid = d0.qid AND d$s.cid = x.c$s").mkString("\n  ")
    val rJoins = (0 until m).map(s =>
      s"JOIN cn${s}_$iters r$s ON r$s.cid = x.c$s").mkString("\n  ")
    val adot = (0 until m).map(s => s"d$s.dot").mkString(" + ")
    val rn = (0 until m).map(s => s"r$s.cnsq").mkString(" + ")
    s"""${ivfAssignCtes(nlist, iters, 1.0)},
       |pseed AS (
       |  SELECT vec_id, CAST(rn - 1 AS BIGINT) AS cid FROM (
       |    SELECT vec_id,
       |      ROW_NUMBER() OVER (ORDER BY $seedU ASC, vec_id ASC) AS rn
       |    FROM e) WHERE rn <= $ksub),
       |${pqSubCtes(m, ksub, iters, dims, "pseed")},
       |probes AS (
       |  SELECT vec_id AS qid, cid FROM (
       |    SELECT d.vec_id, d.cid,
       |      ROW_NUMBER() OVER (PARTITION BY d.vec_id
       |        ORDER BY (n.nsq + cn.cnsq - 2 * d.dot) ASC, d.cid ASC) AS pr
       |    FROM dt$f d
       |    JOIN n ON n.vec_id = d.vec_id
       |    JOIN cn$f cn ON cn.cid = d.cid
       |    WHERE d.vec_id < $nQueries)
       |  WHERE pr <= $nprobe),
       |${qdCtes.mkString(",\n")},
       |codes AS (
       |  SELECT a0.vec_id, l.cid AS list_id, $codeCols
       |  FROM asgF0 a0 $codeJoin JOIN asgF l USING (vec_id)),
       |scored AS (
       |  SELECT d0.qid, x.vec_id AS nid,
       |    CAST(($adot) AS DOUBLE)
       |      / sqrt(CAST(qn.nsq AS DOUBLE))
       |      / sqrt(CAST(($rn) AS DOUBLE)) AS cos
       |  FROM codes x
       |  JOIN probes pb ON pb.cid = x.list_id
       |  JOIN qd0 d0 ON d0.qid = pb.qid AND d0.cid = x.c0
       |  $dJoins
       |  $rJoins
       |  JOIN n qn ON qn.vec_id = d0.qid
       |  WHERE x.vec_id <> d0.qid)${refine.map(refineTailSql(k, _))
        .getOrElse("\n" + adcTopKTail(k))}""".stripMargin
  }

  /** DuckDB replay of [[cosineTopKIvfPqResidualRefined]]: the coarse
    * Lloyd chain to asgF (shared [[ivfAssignCtes]]), the residual
    * relation ur = u − c(list), the per-subspace PQ chains over ur
    * ([[pqSubCtes]] with srcU="ur"), raw-query luts (qu/qd — the query
    * side never residualizes), the per-(query, list) coarse dot from
    * dt, and the reconstruction norm ‖c‖² + Σ‖r̂ₛ‖² + 2Σ⟨cₛ, r̂ₛ⟩ — all
    * exact integers until the final cosine division, exactly as the
    * operator computes them.
    */
  private def ivfPqResidualOracleSql(nQueries: Int, k: Int, nlist: Int,
      nprobe: Int, m: Int, ksub: Int, iters: Int, dims: Int,
      refine: Option[Int] = None): String = {
    val f = iters
    val len = dims / m
    val seedU = detUniformSql("ivfseed", "vec_id")
    val quCtes = (0 until m).map { s =>
      val off = s * len
      s"""qu$s AS (SELECT vec_id, val, i - $off AS i FROM u
         |  WHERE i > $off AND i <= ${off + len} AND vec_id < $nQueries),
         |qd$s AS (
         |  SELECT u.vec_id AS qid, c.cid, CAST(SUM(u.val * c.cval) AS BIGINT) AS dot
         |  FROM qu$s u JOIN c${s}_$f c ON c.i = u.i GROUP BY 1, 2)""".stripMargin
    }
    val crdCtes = (0 until m).map { s =>
      val off = s * len
      s"""crd$s AS (
         |  SELECT l.vec_id, CAST(SUM(cc.cval * pc.cval) AS BIGINT) AS d
         |  FROM asgF l
         |  JOIN asgF$s asub ON asub.vec_id = l.vec_id
         |  JOIN c$f cc ON cc.cid = l.cid AND cc.i > $off AND cc.i <= ${off + len}
         |  JOIN c${s}_$f pc ON pc.cid = asub.cid AND pc.i = cc.i - $off
         |  GROUP BY 1)""".stripMargin
    }
    val codeJoin = (1 until m).map(s =>
      s"JOIN asgF$s a$s USING (vec_id)").mkString(" ")
    val codeCols = (0 until m).map(s => s"a$s.cid AS c$s").mkString(", ")
    val dJoins = (1 until m).map(s =>
      s"JOIN qd$s d$s ON d$s.qid = d0.qid AND d$s.cid = x.c$s").mkString("\n  ")
    val rJoins = (0 until m).map(s =>
      s"JOIN cn${s}_$f r$s ON r$s.cid = x.c$s").mkString("\n  ")
    val crdJoins = (0 until m).map(s =>
      s"JOIN crd$s cr$s ON cr$s.vec_id = x.vec_id").mkString("\n  ")
    val adot = (0 until m).map(s => s"d$s.dot").mkString(" + ")
    val rn = (0 until m).map(s => s"r$s.cnsq").mkString(" + ")
    val crds = (0 until m).map(s => s"cr$s.d").mkString(" + ")
    s"""${ivfAssignCtes(nlist, iters, 1.0)},
       |ur AS MATERIALIZED (
       |  SELECT u.vec_id, u.i, u.val - c.cval AS val
       |  FROM u JOIN asgF a USING (vec_id)
       |  JOIN c$f c ON c.cid = a.cid AND c.i = u.i),
       |pseed AS (
       |  SELECT vec_id, CAST(rn - 1 AS BIGINT) AS cid FROM (
       |    SELECT vec_id,
       |      ROW_NUMBER() OVER (ORDER BY $seedU ASC, vec_id ASC) AS rn
       |    FROM e) WHERE rn <= $ksub),
       |${pqSubCtes(m, ksub, iters, dims, "pseed", srcU = "ur")},
       |probes AS (
       |  SELECT vec_id AS qid, cid FROM (
       |    SELECT d.vec_id, d.cid,
       |      ROW_NUMBER() OVER (PARTITION BY d.vec_id
       |        ORDER BY (n.nsq + cn.cnsq - 2 * d.dot) ASC, d.cid ASC) AS pr
       |    FROM dt$f d
       |    JOIN n ON n.vec_id = d.vec_id
       |    JOIN cn$f cn ON cn.cid = d.cid
       |    WHERE d.vec_id < $nQueries)
       |  WHERE pr <= $nprobe),
       |qcd AS (SELECT vec_id AS qid, cid, dot FROM dt$f
       |  WHERE vec_id < $nQueries),
       |${quCtes.mkString(",\n")},
       |${crdCtes.mkString(",\n")},
       |codes AS (
       |  SELECT a0.vec_id, l.cid AS list_id, $codeCols
       |  FROM asgF0 a0 $codeJoin JOIN asgF l USING (vec_id)),
       |scored AS (
       |  SELECT d0.qid, x.vec_id AS nid,
       |    CAST((qc.dot + $adot) AS DOUBLE)
       |      / sqrt(CAST(qn.nsq AS DOUBLE))
       |      / sqrt(CAST((cnc.cnsq + $rn + 2 * ($crds)) AS DOUBLE)) AS cos
       |  FROM codes x
       |  JOIN probes pb ON pb.cid = x.list_id
       |  JOIN qcd qc ON qc.qid = pb.qid AND qc.cid = x.list_id
       |  JOIN qd0 d0 ON d0.qid = pb.qid AND d0.cid = x.c0
       |  $dJoins
       |  $rJoins
       |  $crdJoins
       |  JOIN cn$f cnc ON cnc.cid = x.list_id
       |  JOIN n qn ON qn.vec_id = d0.qid
       |  WHERE x.vec_id <> d0.qid)${refine.map(refineTailSql(k, _))
        .getOrElse("\n" + adcTopKTail(k))}""".stripMargin
  }

  type Q = (SparkSession, String) => DataFrame

  /** q59's pinned LSH geometry = [[lshParams]] at the verify-corpus scale
    * (the driver's sf0.01 embeddings table has 500 vectors): (20, 4).
    * Pinned rather than derived at run time so the static SQL oracle
    * mirrors the exact same bucket math; [[cosineNearDupsAuto]] is the
    * self-tuning path (recall spec-checked in SimilaritySpec).
    */
  private val (q59Bands, q59Planes) = lshParams(500, 0.35)

  /** q78 exercises [[cosineNearDupsAuto]] — the geometry is chosen at RUN
    * time from the actual corpus count, and the oracle replays what
    * lshParams yields at the verify corpus's 500 vectors with q78's
    * (minCos=0.5, recall=0.9): any drift in the runtime count or the
    * parameter-selection math changes the buckets and hash-mismatches.
    * Deliberately a different geometry than q59 — (11,4) vs (20,4) — so
    * the auto path isn't re-proving the pinned one.
    */
  private val (q78Bands, q78Planes) = lshParams(500, 0.5, targetRecall = 0.9)

  /** q92's pinned cluster count = [[semanticNlist]] at the verify
    * corpus's 500 vectors (⌈√500⌉ = 23). The RUNTIME side derives it
    * from the actual corpus count, so — like q78's auto geometry — any
    * drift in the count or the sizing math changes the clustering and
    * hash-mismatches against this pinned replay.
    */
  private val q92Nlist = semanticNlist(500)

  /** q99's pinned geometry = [[annParams]] at the verify corpus's 500
    * vectors with (k=3, targetRecall=0.9): (nlist=23, nprobe=14,
    * kFactor=32, m=8). The RUNTIME side derives it from the actual
    * corpus count, so — exactly like q78's auto LSH geometry and q92's
    * auto nlist — any drift in the count or the selection math changes
    * the probed lists/candidate set and hash-mismatches against this
    * pinned replay. Deliberately a different geometry than q98's
    * hand-picked (16, 4, 16): the auto path isn't re-proving the
    * pinned one.
    */
  private val q99Geom = annParams(500, 3, 0.9)

  def queries: Map[String, Q] = Map(
    "q37_cosine_topk" -> ((s, d) => cosineTopK(Tables.load(s, d).embeddings, 5, 5)),
    "q38_cosine_topk_lsh" -> ((s, d) =>
      cosineTopKLsh(Tables.load(s, d).embeddings, 20, 3)),
    "q51_cosine_topk_ivf" -> ((s, d) =>
      cosineTopKIvf(Tables.load(s, d).embeddings, 10, 3)),
    // Sampled-training IVF: Lloyd over the hash-derived half of the
    // corpus, assignment over all of it — the bounded-training-cost
    // index build that holds at 100 TB (see trainCentroidsSampled).
    "q80_cosine_topk_ivf_sampled" -> ((s, d) =>
      cosineTopKIvf(Tables.load(s, d).embeddings, 10, 3,
        trainFrac = 0.5)),
    // PQ ADC: the compressed-codes serving path — full-precision work is
    // m×ksub dots on the query side; the corpus scan touches 4-byte codes.
    "q87_cosine_topk_pq" -> ((s, d) =>
      cosineTopKPq(Tables.load(s, d).embeddings, 10, 3)),
    // IVF-PQ: coarse pruning over compressed codes — the composed ANN
    // shape at 100 TB; same component geometry as q51 (coarse) + q87 (PQ).
    "q94_cosine_topk_ivfpq" -> ((s, d) =>
      cosineTopKIvfPq(Tables.load(s, d).embeddings, 10, 3)),
    // Refined PQ/IVF-PQ at the retrieval-grade defaults (64-bit codes,
    // ADC top k·kFactor=48 → exact re-rank to top 3): the config whose
    // dup-recall is measured at 1.0 in bench_r12_sf1.json, vs 0.57 for
    // the 12-bit q87/q94 compression primitives at 10× scale.
    "q97_cosine_topk_pq_refined" -> ((s, d) =>
      cosineTopKPqRefined(Tables.load(s, d).embeddings, 10, 3)),
    "q98_cosine_topk_ivfpq_refined" -> ((s, d) =>
      cosineTopKIvfPqRefined(Tables.load(s, d).embeddings, 10, 3)),
    // Recall-targeted auto geometry: the whole (nlist, nprobe, kFactor,
    // m) shape derives from the runtime corpus count via annParams — the
    // deployment entry point where the caller states the recall they
    // need; the oracle replays the pinned verify-corpus geometry.
    "q99_cosine_topk_auto" -> ((s, d) =>
      cosineTopKAuto(Tables.load(s, d).embeddings, 10, 3,
        targetRecall = 0.9)),
    // Residual IVF-PQ (FAISS IndexIVFPQ by_residual=true): codebooks
    // train on and encode v − c(list); same serve geometry as q98 so
    // the recall delta is attributable to residual encoding alone.
    "q100_cosine_topk_ivfpq_residual" -> ((s, d) =>
      cosineTopKIvfPqResidualRefined(Tables.load(s, d).embeddings, 10, 3)),
    // Serving-side embedding near-dup: an incoming batch (the first 20
    // vectors) probed against the ivfIndex of the whole corpus — the
    // per-batch ingest dedup, cosine counterpart of q77's serve half.
    "q95_cosine_neardup_serve" -> ((s, d) => {
      import s.implicits._
      val emb = Tables.load(s, d).embeddings
      val (cents, assigned) = ivfIndex(emb)
      cosineNearDupsFromIndex(cents, assigned,
        emb.filter($"vec_id" < 20), 0.35)
    }),
    // Auto-sized semantic dedup: nlist derives from the runtime corpus
    // count (semanticNlist) and Lloyd trains on the hash-cap half-sample —
    // the oracle replays both at the pinned verify-corpus geometry.
    "q92_semantic_dedup" -> ((s, d) =>
      semanticDedup(Tables.load(s, d).embeddings, 0.35)),
    "q59_cosine_neardups" -> ((s, d) =>
      cosineNearDups(Tables.load(s, d).embeddings, 0.35, q59Bands, q59Planes)),
    "q78_cosine_neardups_auto" -> ((s, d) =>
      cosineNearDupsAuto(Tables.load(s, d).embeddings, 0.5, targetRecall = 0.9)),
    // Same threshold + pinned geometry as q59 ON PURPOSE: the pair plan
    // is identical, so in a shared session the closure rides q59's band
    // cache instead of rebuilding it (see the q59Bands scaladoc).
    "q79_cosine_neardup_clusters" -> ((s, d) =>
      cosineNearDupClusters(Tables.load(s, d).embeddings, 0.35,
        q59Bands, q59Planes)),
    // Nearest neighbor per query, written entirely in SQL against the
    // registered custom expression (dot_q) — the engine's SQL surface is
    // part of the driver-checked contract, not just the Column API.
    "q60_sql_ann" -> ((s, d) => {
      graft.GraftExtensions.register(s)
      Tables.load(s, d).embeddings.createOrReplaceTempView("embeddings_v")
      s.sql(
        """WITH e AS (
          |  SELECT vec_id,
          |    transform(embedding, x -> CAST(round(x * 1000.0, 0) AS BIGINT)) AS v
          |  FROM embeddings_v)
          |SELECT qid, nid, cos FROM (
          |  SELECT qid, nid, cos,
          |    ROW_NUMBER() OVER (PARTITION BY qid
          |      ORDER BY cos DESC, nid ASC) AS rk
          |  FROM (
          |    SELECT q.vec_id AS qid, x.vec_id AS nid,
          |      CAST(dot_q(q.v, x.v) AS DOUBLE)
          |        / sqrt(CAST(dot_q(q.v, q.v) AS DOUBLE))
          |        / sqrt(CAST(dot_q(x.v, x.v) AS DOUBLE)) AS cos
          |    FROM e q JOIN e x ON x.vec_id <> q.vec_id
          |    WHERE q.vec_id < 8))
          |WHERE rk = 1""".stripMargin)
    }),
    // The recall-targeted auto entry point from pure SQL: the
    // ann_topk_auto TABLE function (GraftExtensions) macro-expands to
    // cosineTopKAuto's serve plan at analysis time — same runtime
    // corpus-count → annParams geometry as q99, reached without a line
    // of Scala. The oracle replays q99's pinned verify-corpus geometry.
    "q103_sql_ann_auto" -> ((s, d) => {
      graft.GraftExtensions.register(s)
      Tables.load(s, d).embeddings.createOrReplaceTempView("embeddings_v")
      s.sql(
        "SELECT qid, nid, cos, rk FROM ann_topk_auto('embeddings_v', 10, 3, 0.9)")
    }),
    // q92 reached through the SQL table function — the auto-sized
    // SemDeDup verdict relation composable from pure SQL (the outer
    // projection proves it composes like any relation).
    "q105_sql_semantic_dedup" -> ((s, d) => {
      graft.GraftExtensions.register(s)
      Tables.load(s, d).embeddings.createOrReplaceTempView("embeddings_v")
      s.sql(
        "SELECT vec_id, list_id, kept FROM semantic_dedup('embeddings_v', 0.35)")
    })
  )

  def oracles: Map[String, String] = Map(
    "q37_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)) AS v
        |  FROM embeddings),
        |u AS (
        |  SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS i FROM e),
        |n AS (
        |  SELECT vec_id, CAST(SUM(val * val) AS BIGINT) AS nsq FROM u GROUP BY vec_id),
        |d AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid,
        |    CAST(SUM(a.val * b.val) AS BIGINT) AS dot
        |  FROM u a JOIN u b ON a.i = b.i AND b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 5 GROUP BY 1, 2),
        |c AS (
        |  SELECT qid, nid,
        |    CAST(dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE)) / sqrt(CAST(nb.nsq AS DOUBLE)) AS cos
        |  FROM d JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid)
        |SELECT qid, nid, cos, rk FROM (
        |  SELECT qid, nid, cos,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, nid ASC) AS BIGINT) AS rk
        |  FROM c) WHERE rk <= 5""".stripMargin,
    // q38 IS oracle-able despite being LSH: buckets come from md5-derived
    // hyperplanes with exact integer dot signs, so DuckDB reproduces the
    // candidate sets bit-for-bit (same answer as the Spark plan, not an
    // independent ground truth — recall itself is checked in the spec
    // against brute force).
    "q38_cosine_topk_lsh" -> {
      val planeSum = (0 until 4).map { p =>
        val h = detHash32Sql(s"plane$p", "i - 1")
        s"CASE WHEN SUM(val * ($h * 2 - 4294967296)) >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString(" + ")
      s"""WITH e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)) AS v
         |  FROM embeddings),
         |u AS (
         |  SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS i FROM e),
         |n AS (
         |  SELECT vec_id, CAST(SUM(val * val) AS BIGINT) AS nsq FROM u GROUP BY vec_id),
         |b AS (
         |  SELECT vec_id, CAST($planeSum AS BIGINT) AS bucket FROM u GROUP BY vec_id),
         |cand AS (
         |  SELECT q.vec_id AS qid, x.vec_id AS nid
         |  FROM b q JOIN b x ON q.bucket = x.bucket AND x.vec_id <> q.vec_id
         |  WHERE q.vec_id < 20),
         |d AS (
         |  SELECT c.qid, c.nid, CAST(SUM(a.val * bb.val) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN u a ON a.vec_id = c.qid
         |  JOIN u bb ON bb.vec_id = c.nid AND bb.i = a.i
         |  GROUP BY 1, 2),
         |c2 AS (
         |  SELECT qid, nid,
         |    CAST(dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE)) / sqrt(CAST(nb.nsq AS DOUBLE)) AS cos
         |  FROM d JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid)
         |SELECT qid, nid, cos, rk FROM (
         |  SELECT qid, nid, cos,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cos DESC, nid ASC) AS BIGINT) AS rk
         |  FROM c2) WHERE rk <= 3""".stripMargin
    },
    "q60_sql_ann" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)) AS v
        |  FROM embeddings),
        |u AS (
        |  SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS i FROM e),
        |n AS (
        |  SELECT vec_id, CAST(SUM(val * val) AS BIGINT) AS nsq FROM u GROUP BY vec_id),
        |d AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS nid,
        |    CAST(SUM(a.val * b.val) AS BIGINT) AS dot
        |  FROM u a JOIN u b ON a.i = b.i AND b.vec_id <> a.vec_id
        |  WHERE a.vec_id < 8 GROUP BY 1, 2),
        |c AS (
        |  SELECT qid, nid,
        |    CAST(dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE)) / sqrt(CAST(nb.nsq AS DOUBLE)) AS cos
        |  FROM d JOIN n na ON na.vec_id = qid JOIN n nb ON nb.vec_id = nid)
        |SELECT qid, nid, cos FROM (
        |  SELECT qid, nid, cos,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS rk
        |  FROM c) WHERE rk = 1""".stripMargin,
    // The IVF index is exact-integer Lloyd iteration (hash-seeded), so the
    // oracle replays the same clustering in SQL — same answer as the Spark
    // plan by construction; recall vs brute force is checked in IvfSpec.
    "q51_cosine_topk_ivf" -> ivfOracleSql(nQueries = 10, k = 3,
      nlist = 16, nprobe = 4, iters = 2),
    "q92_semantic_dedup" -> semanticDedupOracleSql("0.35", nlist = q92Nlist,
      iters = 2, trainFrac = 0.5),
    "q87_cosine_topk_pq" -> pqOracleSql(nQueries = 10, k = 3,
      m = 4, ksub = 8, iters = 2, dims = 64),
    "q94_cosine_topk_ivfpq" -> ivfPqOracleSql(nQueries = 10, k = 3,
      nlist = 16, nprobe = 4, m = 4, ksub = 8, iters = 2, dims = 64),
    "q97_cosine_topk_pq_refined" -> pqOracleSql(nQueries = 10, k = 3,
      m = 8, ksub = 256, iters = 2, dims = 64, refine = Some(48)),
    "q98_cosine_topk_ivfpq_refined" -> ivfPqOracleSql(nQueries = 10, k = 3,
      nlist = 16, nprobe = 4, m = 8, ksub = 256, iters = 2, dims = 64,
      refine = Some(48)),
    "q99_cosine_topk_auto" -> ivfPqResidualOracleSql(nQueries = 10, k = 3,
      nlist = q99Geom.nlist, nprobe = q99Geom.nprobe, m = q99Geom.m,
      ksub = 256, iters = 2, dims = 64,
      refine = Some(3 * q99Geom.kFactor)),
    "q100_cosine_topk_ivfpq_residual" -> ivfPqResidualOracleSql(
      nQueries = 10, k = 3, nlist = 16, nprobe = 4, m = 8, ksub = 256,
      iters = 2, dims = 64, refine = Some(48)),
    // q103 is q99 reached through the SQL table function — identical
    // operator, identical pinned-geometry oracle.
    "q103_sql_ann_auto" -> ivfPqResidualOracleSql(nQueries = 10, k = 3,
      nlist = q99Geom.nlist, nprobe = q99Geom.nprobe, m = q99Geom.m,
      ksub = 256, iters = 2, dims = 64,
      refine = Some(3 * q99Geom.kFactor)),
    // q105 is q92 reached through the SQL table function — identical
    // operator, identical pinned-geometry Lloyd-replay oracle.
    "q105_sql_semantic_dedup" -> semanticDedupOracleSql("0.35",
      nlist = q92Nlist, iters = 2, trainFrac = 0.5),
    "q95_cosine_neardup_serve" -> ivfServeOracleSql(nQueries = 20,
      minCosSql = "0.35", nlist = 16, nprobe = 4, iters = 2),
    "q80_cosine_topk_ivf_sampled" -> ivfOracleSql(nQueries = 10, k = 3,
      nlist = 16, nprobe = 4, iters = 2, trainFrac = 0.5),
    "q59_cosine_neardups" ->
      cosineNearDupsOracleSql(q59Bands, q59Planes, "0.35"),
    "q78_cosine_neardups_auto" ->
      cosineNearDupsOracleSql(q78Bands, q78Planes, "0.5"),
    "q79_cosine_neardup_clusters" ->
      cosineNearDupsOracleSql(q59Bands, q59Planes, "0.35", clusters = true)
  )

  /** DuckDB replay of [[cosineNearDups]] at a given geometry. Mirrors the
    * banded signature bit-for-bit: band b's bucket packs the sign bits of
    * planes b*P+p, p < P — same md5-derived integer hyperplanes, same
    * global plane indexing as hyperplaneBandArr. `minCosSql` is the
    * threshold as a SQL literal so both sides compare the identical
    * double. With `clusters`, appends the transitive closure (recursive
    * CTE over the pair graph, min-reachable label per node) replaying
    * [[cosineNearDupClusters]] — the same oracle shape as q67's.
    */
  private def cosineNearDupsOracleSql(bands: Int, planes: Int,
      minCosSql: String, clusters: Boolean = false): String = {
    val bucketCols = (0 until bands).map { b =>
      val planeSum = (0 until planes).map { p =>
        val h = detHash32Sql(s"plane${b * planes + p}", "i - 1")
        s"CASE WHEN SUM(val * ($h * 2 - 4294967296)) >= 0 THEN ${1L << p} ELSE 0 END"
      }.mkString(" + ")
      s"CAST($planeSum AS BIGINT) AS k$b"
    }
    val bandUnion = (0 until bands).map(b =>
      s"SELECT vec_id, $b AS band, k$b AS bucket FROM b").mkString(
      "\n  UNION ALL ")
    val common =
      s"""WITH ${if (clusters) "RECURSIVE " else ""}e AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0, 0) AS BIGINT)) AS v
         |  FROM embeddings),
         |u AS (
         |  SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS i FROM e),
         |n AS (
         |  SELECT vec_id, CAST(SUM(val * val) AS BIGINT) AS nsq FROM u GROUP BY vec_id),
         |b AS (
         |  SELECT vec_id, ${bucketCols.mkString(",\n    ")}
         |  FROM u GROUP BY vec_id),
         |bb AS (
         |  $bandUnion),
         |cand AS (
         |  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM bb x JOIN bb y
         |    ON x.band = y.band AND x.bucket = y.bucket
         |    AND x.vec_id < y.vec_id),
         |d AS (
         |  SELECT c.vec_a, c.vec_b, CAST(SUM(a.val * bb.val) AS BIGINT) AS dot
         |  FROM cand c
         |  JOIN u a ON a.vec_id = c.vec_a
         |  JOIN u bb ON bb.vec_id = c.vec_b AND bb.i = a.i
         |  GROUP BY 1, 2)""".stripMargin
    if (!clusters)
      s"""$common
         |SELECT vec_a, vec_b, cos FROM (
         |  SELECT vec_a, vec_b,
         |    CAST(dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE)) / sqrt(CAST(nb.nsq AS DOUBLE)) AS cos
         |  FROM d JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b)
         |WHERE cos >= CAST($minCosSql AS DOUBLE)""".stripMargin
    else
      s"""$common,
         |pairs AS (
         |  SELECT vec_a, vec_b FROM (
         |    SELECT vec_a, vec_b,
         |      CAST(dot AS DOUBLE) / sqrt(CAST(na.nsq AS DOUBLE)) / sqrt(CAST(nb.nsq AS DOUBLE)) AS cos
         |    FROM d JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b)
         |  WHERE cos >= CAST($minCosSql AS DOUBLE)),
         |edges AS (
         |  SELECT vec_a AS src, vec_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT vec_b, vec_a FROM pairs),
         |reach AS (
         |  SELECT vec_id AS node, vec_id AS peer FROM e
         |  UNION
         |  SELECT r.node, g.dst FROM reach r JOIN edges g ON r.peer = g.src),
         |lbl AS (SELECT node AS vec_id, MIN(peer) AS cluster_id
         |        FROM reach GROUP BY node),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
         |       FROM lbl GROUP BY cluster_id)
         |SELECT l.vec_id, l.cluster_id, sz.cluster_size,
         |  l.vec_id = l.cluster_id AS keep
         |FROM lbl l JOIN sz USING (cluster_id)""".stripMargin
  }
}
