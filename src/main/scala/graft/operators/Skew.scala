package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for fact-fact joins.
  *
  * The default posture at scale is AQE: `spark.sql.adaptive.skewJoin`
  * splits an oversized shuffle partition into sub-tasks and replicates the
  * matching partition of the other side — no plan changes, verified by
  * `SkewSpec`. Salting is the explicit fallback for the cases AQE does not
  * cover: a single key too hot for one task even after splitting on a
  * non-AQE engine path, deterministic partition-count control, or skewed
  * AGGREGATIONS (AQE never splits a groupBy key; pre-aggregate on
  * (key, salt) then re-aggregate on key — same trick, one extra partial).
  */
object Skew {

  /** Equi-join with the skewed side salted: the hot side's rows scatter
    * over `nSalts` sub-keys and the other side is replicated `nSalts`
    * times, so one hot key occupies `nSalts` shuffle partitions instead
    * of one. Result equals `skewed.join(other, key, joinType)` exactly.
    *
    * The salt is `xxhash64` over the skewed side's whole row PLUS a
    * per-row ordinal (`monotonically_increasing_id`): the row hash alone
    * would send byte-identical duplicate rows — a plausible shape for a
    * hot key in a dedup-centric corpus — to a single salt, silently
    * degenerating back to the unsalted join; the ordinal scatters them.
    * The ordinal makes the salt nondeterministic across retries, which is
    * benign here: a row's join matches are identical under every salt
    * value (the other side is replicated for all salts), so the salt only
    * chooses WHERE a row is joined, never WHAT it joins with, and Spark's
    * indeterminate-stage rollback re-runs the whole map stage on partial
    * recompute rather than mixing old and new placements.
    * Replication multiplies the OTHER side's shuffle volume by `nSalts`:
    * salt the side with the hot keys, keep `nSalts` small (8–32), and
    * prefer AQE when it already handles the skew.
    *
    * Supported joinTypes: "inner", "left"/"left_outer" (an unmatched
    * skewed row appears exactly once — its salt replica misses, the other
    * nSalts−1 replicas never existed). Right/full-outer would emit one
    * null row per UNMATCHED other-side replica; refuse rather than
    * silently multiply.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val jt = joinType.toLowerCase.replace("_outer", "").replace("outer", "")
    require(jt == "inner" || jt == "left",
      s"saltedJoin supports inner/left, got $joinType")
    require(!(skewed.columns ++ other.columns).contains("_salt"),
      "saltedJoin reserves the _salt column name")
    val salted = skewed.withColumn("_salt", saltExpr(skewed, nSalts))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1L))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** The salt assignment [[saltedJoin]] shuffles on (exposed for the
    * duplicate-row distribution proof in SkewSpec).
    */
  private[graft] def saltExpr(skewed: DataFrame,
      nSalts: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(skewed.columns.map(col) :+
      monotonically_increasing_id(): _*), lit(nSalts.toLong))
}
