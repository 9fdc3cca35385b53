package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch scale probe for the MIH hamming-join rewrite — NOT part of
  * the driver contract. Runs the q101 shape (60-bit simhashes, maxDist
  * 5) on a 10× corpus (bench/sf1 by default) at the legacy r=0 chunk
  * geometry (chunks = maxDist+1 — the r12–r14 plan the r14 verdict
  * marked weak) and at the cost-model geometry [[graft.operators
  * .Dedup.mihChunks]] now picks, reporting per-geometry wall seconds,
  * raw candidate volume (join matches before verify), and the result
  * pair count (which must be identical — the exactness check rides
  * along). One extra leg prints the serve side (hammingNearPairsAgainst
  * via simhashNearDupsFromState) at the auto geometry.
  *
  *   SPARK_GRAFT_SF_DIR=bench/sf1 tools/run.sh graft.MihProbe
  *
  * SPARK_GRAFT_MIH_SIGS selects the SIGNATURE-ONLY mode (r15 verdict
  * task 1 — the 50M-decade probe, where generating/signing 50M
  * documents would cost more than the join being measured): point it
  * at a (doc_id, simhash) parquet (tools/gen_sigs_scale.py — uniform
  * 60-bit signatures with near-pairs planted at the rate the
  * doc-derived corpora measure) and the probe loads signatures
  * directly; the serve legs probe batches of SPARK_GRAFT_MIH_BATCH
  * signatures (default 200; the r16 50M capture also ran 10k) against
  * the full state through the same hammingNearPairsAgainst join the
  * gate tier runs (batch-local signing is irrelevant to what it
  * measures — the state-side join geometry).
  *
  *   SPARK_GRAFT_MIH_SIGS=bench/sigs50M/signatures.parquet \
  *     SPARK_GRAFT_MIH_LEGS=mih tools/run.sh graft.MihProbe
  */
object MihProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench/sf1")
    val sigsPath = sys.env.get("SPARK_GRAFT_MIH_SIGS")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 2)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val (bits, maxDist) = (60, 5)
    // Sign once, persist, and time ONLY the join legs: the signature
    // aggregation is identical for both geometries and would otherwise
    // dominate the comparison. In sigs mode the signatures come
    // pre-built from parquet.
    val sigs = (sigsPath match {
      case Some(p) => spark.read.parquet(p)
        .select(col("doc_id").as("_id"), col("simhash").as("_sig"))
      case None =>
        graft.operators.Dedup.simhashes(
            Tables.load(spark, sfDir).documents, bits)
          .select(col("doc_id").as("_id"), col("simhash").as("_sig"))
    }).persist()
    val n = sigs.count()
    val auto = graft.operators.Dedup.mihChunks(bits, maxDist, n,
      graft.operators.Dedup.mihBroadcastRows(spark))
    val legacy = maxDist + 1
    // The cost model's own predictions for the picked geometry — the
    // "predicted vs measured" row of the r16 capture: expected raw
    // candidates under the uniform-signature model (per-chunk ball ×
    // n²/2^width, summed) and the probe-side fan-out rows.
    def ballSz(w: Int, r: Int): Double = {
      var t = 0.0; var c = 1.0
      for (i <- 0 to r) { t += c; c = c * (w - i) / (i + 1) }
      t
    }
    def predicted(c: Int): (Double, Double) = {
      val r = maxDist / c
      val terms = (0 until c).map { i =>
        val w = if (i == c - 1) bits - (bits / c) * (c - 1) else bits / c
        val b = ballSz(w, r)
        // n²/2: the join keeps ordered x._id < y._id pairs only.
        (b, b * n.toDouble * n.toDouble / 2.0 / math.pow(2.0, w.toDouble))
      }
      (terms.map(_._1).sum * n, terms.map(_._2).sum)
    }
    val (predFan, predCand) = predicted(auto)
    println(s"n=$n bits=$bits maxDist=$maxDist autoChunks=$auto " +
      f"predictedFanOutRows=$predFan%.3e predictedCandidates=$predCand%.3e")

    // SPARK_GRAFT_MIH_CANDS=0 skips the candidate-count pass (a ~20 min
    // 3.15G-row aggregation at 50M) — for join-regime A/Bs where the
    // candidate volume is already captured and only the wall changes.
    val wantCands = !sys.env.get("SPARK_GRAFT_MIH_CANDS").contains("0")
    def leg(name: String, chunks: Int): (Long, Long, Double) = {
      val cand =
        if (!wantCands) -1L
        else graft.operators.Dedup
          .hammingCandidateCount(sigs, bits, maxDist, chunks)
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup
        .hammingNearPairsWithChunks(sigs, bits, maxDist, chunks).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-8s chunks=$chunks candidates=$cand pairs=$pairs " +
        f"wall=$sec%.2fs")
      (cand, pairs, sec)
    }

    // SPARK_GRAFT_MIH_LEGS selects legs (mih|legacy|both|serve,
    // default both) — at 5M docs the legacy leg alone is a
    // ~75G-candidate join, so the decades are probed as separate
    // processes; "serve" skips both join legs entirely (the 50M mih
    // leg is a 35-minute join — re-measuring serve must not re-pay it).
    val legs = sys.env.getOrElse("SPARK_GRAFT_MIH_LEGS", "both")
    val (cl, pl, sl) =
      if (legs == "both" || legs == "legacy") leg("legacy", legacy)
      else (0L, -1L, 0.0)
    val (ca, pa, sa) =
      if (legs == "both" || legs == "mih") leg("mih", auto)
      else (0L, -1L, 0.0)
    if (pl >= 0 && pa >= 0)
      require(pl == pa, s"geometries disagree: $pl vs $pa")

    // Serve legs: two successive batches probed against the full
    // corpus state at the auto geometry (what the gate's signature
    // tier runs). The FIRST batch pays the one-time state chunk-index
    // build and cache population (O(n), amortized across a gate
    // loop's lifetime); the SECOND reuses it — the steady-state
    // per-batch serve cost. That cost is NOT flat in state (the r16
    // 50M leg measured the break: 3.87 s at 5M → 13.4 s at 50M for a
    // 200-doc batch) — it is one map-side scan of the cached chunk
    // index per batch, O(state) with a small constant, amortized over
    // the batch size. Doc mode signs the batch docs (the full q96
    // path); sigs mode probes pre-built batch signatures through the
    // same state-side join.
    val state = sigs.select(col("_id").as("doc_id"), col("_sig").as("simhash"))
    // SPARK_GRAFT_MIH_BATCH sizes the serve batches (default 200). The
    // serve join broadcasts the batch's ball fan-out and SCANS the
    // cached state chunk index map-side — O(state) per batch with a
    // small constant, so the honest serve metric at big states is
    // per-DOC amortized cost: a 50x bigger batch rides the same scan.
    val batchRaw = sys.env.getOrElse("SPARK_GRAFT_MIH_BATCH", "200")
    val batchN = try batchRaw.toLong catch {
      case _: NumberFormatException => sys.error(
        s"SPARK_GRAFT_MIH_BATCH must be a positive integer, got '$batchRaw'")
    }
    require(batchN > 0, s"SPARK_GRAFT_MIH_BATCH must be positive: $batchN")
    def serveLeg(lo: Long, hi: Long): (Long, Double) = {
      val batchIds = $"doc_id" >= lo && $"doc_id" < hi
      val t0 = System.nanoTime()
      val served = (sigsPath match {
        case Some(_) =>
          graft.operators.Dedup.hammingNearPairsAgainst(state,
            state.filter(batchIds), "doc_id", "simhash", bits, maxDist)
        case None =>
          graft.operators.Dedup.simhashNearDupsFromState(state,
            Tables.load(spark, sfDir).documents.filter(batchIds),
            maxDist, bits)
      }).count()
      graft.operators.Dedup.releaseBatchIndexes()
      (served, (System.nanoTime() - t0) / 1e9)
    }
    val (served, serveSec) = serveLeg(0L, batchN)
    val (served2, serveSec2) = serveLeg(batchN, 2L * batchN)

    println(s"""{"probe":"mih","sf_dir":"$sfDir","n":$n,""" +
      s""""bits":$bits,"max_dist":$maxDist,""" +
      s""""legacy":{"chunks":$legacy,"candidates":$cl,"pairs":$pl,""" +
      f""""sec":$sl%.3f},""" +
      s""""mih":{"chunks":$auto,"candidates":$ca,"pairs":$pa,""" +
      f""""sec":$sa%.3f},""" +
      f""""candidate_drop":${cl.toDouble / math.max(1L, ca)}%.1f,""" +
      f""""serve":{"batch":$batchN,"rows":$served,"sec":$serveSec%.3f,""" +
      f""""rows_warm":$served2,"sec_warm":$serveSec2%.3f}}""")
    spark.stop()
  }
}
