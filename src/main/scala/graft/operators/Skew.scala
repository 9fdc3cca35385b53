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
    * The salt is a pure function of the DATA — never of row order,
    * partition ids, or `monotonically_increasing_id` — so a
    * fetch-failure-triggered partial recompute of the map stage assigns
    * every row the same salt it had before, and reducers mixing old and
    * new shuffle outputs cannot duplicate or lose join rows. Two paths:
    *
    *  - `uniqueCols` given (a row-unique key the caller vouches for, e.g.
    *    a primary key): salt = hash(uniqueCols) % nSalts. Zero extra
    *    shuffle; byte-identical VALUES still scatter because their ids
    *    differ. Preferred whenever an id column exists.
    *  - default: a deterministic per-duplicate occurrence index. Rows are
    *    collapsed by full content (`groupBy` over every column — map-side
    *    partial aggregation bounds the extra shuffle volume at the number
    *    of DISTINCT rows per map partition, which is exactly small when
    *    duplication is heavy), then re-expanded with an ordinal, and
    *    salt = hash(row, ordinal) % nSalts. Identical rows are
    *    interchangeable, so which physical row receives which ordinal is
    *    immaterial; the multiset of (row, salt) pairs is a pure function
    *    of the data. The re-expansion explodes in ≤2^20-element chunks so
    *    a row duplicated billions of times builds bounded arrays, not one
    *    giant `sequence`. Requires groupable columns (no MapType), and
    *    float/double VALUES pass through Spark's grouping normalization
    *    (-0.0 becomes 0.0, NaN bit patterns canonicalize) — pass
    *    `uniqueCols` for schemas where either matters.
    *
    * The salt only chooses WHERE a row is joined, never WHAT it joins
    * with (the other side is replicated for all salts), so correctness
    * never depended on the assignment — but determinism under retry did;
    * see SkewSpec "salt assignment is a pure function of the data".
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
      nSalts: Int, joinType: String = "inner",
      uniqueCols: Seq[String] = Nil): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    val jt = joinType.toLowerCase.replace("_outer", "").replace("outer", "")
    require(jt == "inner" || jt == "left",
      s"saltedJoin supports inner/left, got $joinType")
    require(!(skewed.columns ++ other.columns).contains("_salt"),
      "saltedJoin reserves the _salt column name")
    val salted = saltAssign(skewed, nSalts, uniqueCols)
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1L))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Skewed AGGREGATION fallback — the groupBy counterpart of
    * [[saltedJoin]] (AQE splits skewed JOIN partitions, never a groupBy
    * key). Spark's own partial aggregation already bounds the reducer for
    * algebraic aggregates (sum/count/min/max combine map-side); the
    * un-bounded case is collect_list/collect_set, where every value of a
    * hot key otherwise lands in ONE reduce task. Two phases: pre-collect
    * on (key, salt) — nSalts parallel reduce tasks per hot key — then
    * combine the ≤nSalts partial arrays per key in a second, tiny
    * aggregate.
    *
    * The salt derives from the VALUE (hash % nSalts): deterministic
    * across retries (same doctrine as [[saltedJoin]]), and for the set
    * variant it makes per-salt dedup globally correct — equal values
    * share a salt, so distinct-within-bucket IS distinct-overall.
    * Output arrays are sorted: plain collect_list's partition-order
    * nondeterminism is a bug surface this engine refuses everywhere else
    * (hash-derived draws, sorted sink bytes). Null values are dropped,
    * as by the underlying collectors.
    *
    * Output: one row per key, array column named `<value>_list` /
    * `<value>_set`.
    */
  def saltedCollectList(df: DataFrame, key: String, value: String,
      nSalts: Int): DataFrame =
    saltedCollect(df, key, value, nSalts, distinct = false)

  /** See [[saltedCollectList]]; distinct values, same two-phase shape. */
  def saltedCollectSet(df: DataFrame, key: String, value: String,
      nSalts: Int): DataFrame =
    saltedCollect(df, key, value, nSalts, distinct = true)

  private def saltedCollect(df: DataFrame, key: String, value: String,
      nSalts: Int, distinct: Boolean): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    require(!df.columns.contains("_salt") && !df.columns.contains("_part"),
      "saltedCollect reserves the _salt/_part column names")
    val suffix = if (distinct) "_set" else "_list"
    val partial =
      if (distinct) collect_set(col(value)) else collect_list(col(value))
    df.select(col(key), col(value))
      .withColumn("_salt", pmod(xxhash64(col(value)), lit(nSalts.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(partial.as("_part"))
      .groupBy(col(key))
      .agg(array_sort(flatten(collect_list(col("_part"))))
        .as(value + suffix))
  }

  /** Chunk width for the occurrence-index re-expansion: bounds any single
    * `sequence` array at 2^20 longs (8 MB) no matter how hot a duplicate
    * row is, while one level of chunking covers counts up to 2^40.
    */
  private val OrdChunk = 1L << 20

  /** `skewed` plus a deterministic `_salt` column (exposed for SkewSpec's
    * scatter + determinism proofs). Same multiset of rows as the input.
    */
  private[graft] def saltAssign(skewed: DataFrame, nSalts: Int,
      uniqueCols: Seq[String] = Nil): DataFrame = {
    if (uniqueCols.nonEmpty) {
      skewed.withColumn("_salt",
        pmod(xxhash64(uniqueCols.map(col): _*), lit(nSalts.toLong)))
    } else {
      val cols = skewed.columns
      require(!cols.exists(Set("_n", "_chunk", "_i")),
        "saltedJoin reserves the _n/_chunk/_i column names")
      skewed.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("_n"))
        .withColumn("_chunk", // integral (_n-1)/2^20 via shift: Column./ is fractional
          explode(sequence(lit(0L), shiftright(col("_n") - 1L, 20))))
        .withColumn("_i", explode(sequence(lit(0L),
          least(lit(OrdChunk), col("_n") - col("_chunk") * OrdChunk) - 1L)))
        .withColumn("_salt", pmod(
          xxhash64(cols.map(col) :+ (col("_chunk") * OrdChunk + col("_i")): _*),
          lit(nSalts.toLong)))
        .drop("_n", "_chunk", "_i")
    }
  }

  // -------------------------------------------------------------------
  // Driver bindings: the salted paths hash-compared against the PLAIN
  // semantics they must equal (the whole point of the rewrite: salting
  // chooses WHERE work happens, never WHAT the result is).
  // -------------------------------------------------------------------

  type Q = (org.apache.spark.sql.SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // Two-phase salted collect_set vs a plain grouped DISTINCT list:
    // per-salt partials flattened + sorted must equal the one-reducer
    // answer. Array serialized to CSV like the other array oracles.
    "q81_salted_collect_set" -> ((s, d) => {
      val ev = graft.Tables.load(s, d).events
        .select(col("event_type"), col("user_id"))
      saltedCollectSet(ev, "event_type", "user_id", 8)
        .select(col("event_type"),
          array_join(col("user_id_set").cast("array<string>"), ",")
            .as("user_ids"))
    }),
    // Occurrence-index salted join (the default, no-unique-key path:
    // full-row collapse + chunked re-expansion) vs the plain equi-join.
    // lineitem has genuine duplicate (orderkey, quantity) rows, so the
    // deterministic ordinal machinery is exercised on real collisions.
    "q82_salted_join" -> ((s, d) => {
      val t = graft.Tables.load(s, d)
      val skewed = t.lineitem.select(
        col("l_orderkey").as("orderkey"), col("l_quantity").as("quantity"))
      val dim = t.orders.select(
        col("o_orderkey").as("orderkey"), col("o_custkey").as("custkey"))
      saltedJoin(skewed, dim, "orderkey", 8)
    })
  )

  def oracles: Map[String, String] = Map(
    "q81_salted_collect_set" ->
      """SELECT event_type,
        |  array_to_string(list_sort(list(DISTINCT user_id)), ',') AS user_ids
        |FROM events GROUP BY event_type""".stripMargin,
    "q82_salted_join" ->
      """SELECT l.l_orderkey AS orderkey, l.l_quantity AS quantity,
        |  o.o_custkey AS custkey
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey""".stripMargin
  )
}
