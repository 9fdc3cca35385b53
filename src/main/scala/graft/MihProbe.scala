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
  */
object MihProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "bench/sf1")
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
    val docs = Tables.load(spark, sfDir).documents
    // Sign once, persist, and time ONLY the join legs: the signature
    // aggregation is identical for both geometries and would otherwise
    // dominate the comparison.
    val sigs = graft.operators.Dedup.simhashes(docs, bits)
      .select(col("doc_id").as("_id"), col("simhash").as("_sig"))
      .persist()
    val n = sigs.count()
    val auto = graft.operators.Dedup.mihChunks(bits, maxDist, n,
      graft.operators.Dedup.mihBroadcastRows(spark))
    val legacy = maxDist + 1
    println(s"n=$n bits=$bits maxDist=$maxDist autoChunks=$auto")

    def leg(name: String, chunks: Int): (Long, Long, Double) = {
      val cand = graft.operators.Dedup
        .hammingCandidateCount(sigs, bits, maxDist, chunks)
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup
        .hammingNearPairsWithChunks(sigs, bits, maxDist, chunks).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-8s chunks=$chunks candidates=$cand pairs=$pairs " +
        f"wall=$sec%.2fs")
      (cand, pairs, sec)
    }

    // SPARK_GRAFT_MIH_LEGS selects legs (mih|legacy|both, default
    // both) — at 5M docs the legacy leg alone is a ~75G-candidate
    // join, so the decades are probed as separate processes.
    val legs = sys.env.getOrElse("SPARK_GRAFT_MIH_LEGS", "both")
    val (cl, pl, sl) =
      if (legs != "mih") leg("legacy", legacy) else (0L, -1L, 0.0)
    val (ca, pa, sa) =
      if (legs != "legacy") leg("mih", auto) else (0L, -1L, 0.0)
    if (pl >= 0 && pa >= 0)
      require(pl == pa, s"geometries disagree: $pl vs $pa")

    // Serve leg: a 200-doc batch probed against the full corpus state
    // at the auto geometry (what the gate's signature tier runs).
    val batch = docs.filter($"doc_id" < 200)
    val t0 = System.nanoTime()
    val served = graft.operators.Dedup.simhashNearDupsFromState(
      sigs.select(col("_id").as("doc_id"), col("_sig").as("simhash")),
      batch, maxDist, bits).count()
    val serveSec = (System.nanoTime() - t0) / 1e9

    println(s"""{"probe":"mih","sf_dir":"$sfDir","n":$n,""" +
      s""""bits":$bits,"max_dist":$maxDist,""" +
      s""""legacy":{"chunks":$legacy,"candidates":$cl,"pairs":$pl,""" +
      f""""sec":$sl%.3f},""" +
      s""""mih":{"chunks":$auto,"candidates":$ca,"pairs":$pa,""" +
      f""""sec":$sa%.3f},""" +
      f""""candidate_drop":${cl.toDouble / math.max(1L, ca)}%.1f,""" +
      f""""serve":{"batch":200,"rows":$served,"sec":$serveSec%.3f}}""")
    spark.stop()
  }
}
