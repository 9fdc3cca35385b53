package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planted-skew proof for the fact-join path: one hot key carrying 75% of
  * the fact table. Asserts (a) AQE actually splits the skewed sort-merge
  * partition (the 100 TB posture SCALE.md claims), (b) the salted-join
  * fallback produces byte-identical results to the plain join, and that
  * both mitigations leave the answer unchanged.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 200k-row fact: key 0 holds 150k rows, the tail spreads over 96 keys;
  // a second fact with 4 rows per key forces a fact-fact (non-broadcast)
  // join shape.
  private lazy val fact: DataFrame = spark.range(200000L).select(
    when($"id" < 150000L, 0L).otherwise($"id" % 97L).as("k"),
    ($"id" * 7L).as("v"))
  private lazy val other: DataFrame = spark.range(97L * 4L).select(
    ($"id" % 97L).as("k"), ($"id" + 13L).as("w"))

  /** Order-insensitive result digest: count + keyed checksums. */
  private def digest(df: DataFrame): (Long, Long, Long) = {
    val r = df.agg(
      count(lit(1)),
      sum(pmod(xxhash64($"k", $"v", $"w"), lit(1000003L))),
      sum($"v" + $"w")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the planted hot key's SMJ partition; results unchanged") {
    // Ground truth with AQE off (plain SMJ, hot partition unsplit).
    var expected: (Long, Long, Long) = null
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      expected = digest(fact.join(other, "k"))
    }
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // Test-scale thresholds: the hot partition is ~MBs, not the 256MB
      // production default. Factor 2 over the median + a 32KB floor marks
      // it skewed; 128KB advisory size makes the split visible (>10 subs).
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128KB") {
      val joined = fact.join(other, "k")
      val got = digest(joined)
      assert(got == expected, s"skew-split changed the answer: $got vs $expected")
      // The digest finalizes the adaptive plan; the skewed partition must
      // have been detected and split (SMJ flagged, or the AQE shuffle read
      // marked skewed).
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"no skew handling in the executed plan:\n$p")
    }
  }

  test("salted join equals the plain join on the skewed data") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plain = digest(fact.join(other, "k"))
      val salted = operators.Skew.saltedJoin(fact, other, "k", 8)
      assert(digest(salted) == plain)
      // The join really runs on (k, _salt) — the hot key occupies 8
      // shuffle sub-keys, not one.
      val p = salted.queryExecution.executedPlan.toString
      assert(p.contains("_salt"), p)
    }
  }

  test("salted left join keeps unmatched skewed rows exactly once") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // Keys >= 97 never match `other`.
      val withOrphans = fact.union(Seq((997L, 1L), (998L, 2L)).toDF("k", "v"))
      val plain = withOrphans.join(other, Seq("k"), "left")
      val salted = operators.Skew.saltedJoin(withOrphans, other, "k", 8, "left")
      val d = (df: DataFrame) => df.agg(
        count(lit(1)),
        sum(pmod(xxhash64($"k", $"v", coalesce($"w", lit(-1L))), lit(1000003L)))
      ).head()
      assert(d(salted) == d(plain))
      assert(salted.filter($"k" >= 97L).count() == 2)
    }
  }

  test("byte-identical duplicate rows on the hot key still scatter") {
    // 75% of the fact is ONE row repeated verbatim — the degenerate shape
    // for a whole-row-hash salt (every duplicate hashes alike and lands on
    // one salt, i.e. one task). The occurrence ordinal must spread them.
    val dupFact = spark.range(150000L).select(lit(0L).as("k"), lit(42L).as("v"))
      .union(spark.range(50000L).select(($"id" % 97L).as("k"), ($"id" * 7L).as("v")))
    val saltsOnHotKey = operators.Skew.saltAssign(dupFact, 8)
      .filter($"k" === 0L)
      .select("_salt").distinct().count()
    assert(saltsOnHotKey == 8L,
      s"duplicate hot-key rows occupy $saltsOnHotKey/8 salts — salted join " +
        "degenerates back to one task")
    // And the join answer over the duplicate-heavy data is unchanged.
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plain = digest(dupFact.join(other, "k"))
      assert(digest(operators.Skew.saltedJoin(dupFact, other, "k", 8)) == plain)
    }
  }

  test("salt assignment is a pure function of the data") {
    // The retry-safety claim: salts must not depend on row order or
    // physical placement. Recompute the assignment under two different
    // input partitionings (a proxy for a partial map-stage recompute
    // seeing rows in a different order) — the (row content -> per-salt
    // count) histogram must be byte-identical. An order-dependent salt
    // (monotonically_increasing_id, spark_partition_id, rand) fails this.
    val dupFact = spark.range(150000L).select(lit(0L).as("k"), lit(42L).as("v"))
      .union(spark.range(50000L).select(($"id" % 97L).as("k"), ($"id" * 7L).as("v")))
    def histogram(df: DataFrame): Set[(Long, Long, Long, Long)] =
      operators.Skew.saltAssign(df, 8)
        .groupBy($"k", $"v", $"_salt").count()
        .as[(Long, Long, Long, Long)].collect().toSet
    val a = histogram(dupFact.repartition(7))
    val b = histogram(dupFact.repartition(13))
    assert(a == b, "salt histogram changed across recomputes with " +
      "different physical partitionings — salts are not retry-stable")
  }

  test("uniqueCols fast path: deterministic, scattered, and join-equal") {
    // `v` is row-unique here; the caller vouching for that buys a salt
    // with no extra shuffle (no groupBy in the plan).
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plain = digest(fact.join(other, "k"))
      val salted =
        operators.Skew.saltedJoin(fact, other, "k", 8, "inner", Seq("v"))
      assert(digest(salted) == plain)
      val p = salted.queryExecution.optimizedPlan.toString
      assert(!p.contains("Aggregate"),
        s"uniqueCols path must not add a groupBy shuffle:\n$p")
      val saltsOnHotKey = operators.Skew.saltAssign(fact, 8, Seq("v"))
        .filter($"k" === 0L).select("_salt").distinct().count()
      assert(saltsOnHotKey == 8L)
    }
  }

  test("saltedJoin refuses join types that would multiply null rows") {
    intercept[IllegalArgumentException] {
      operators.Skew.saltedJoin(fact, other, "k", 8, "full_outer")
    }
  }

  test("saltedCollectList/Set equal the plain collectors, sorted") {
    // The hot key holds 150k values (with duplicates via % 50000); the
    // two-phase salted collect must equal sort(collect_list) per key,
    // and the set variant sort(collect_set) — per-salt distinct is
    // globally distinct because equal values share a salt.
    val df = fact.select($"k", ($"v" % 50000L).as("v"))
    def asMap(out: DataFrame, c: String): Map[Long, Seq[Long]] =
      out.select(col("k"), col(c)).as[(Long, Seq[Long])]
        .collect().toMap
    val plainList = df.groupBy($"k")
      .agg(sort_array(collect_list($"v")).as("l"))
    assert(asMap(operators.Skew.saltedCollectList(df, "k", "v", 8), "v_list")
      == asMap(plainList, "l"))
    val plainSet = df.groupBy($"k")
      .agg(sort_array(collect_set($"v")).as("s"))
    assert(asMap(operators.Skew.saltedCollectSet(df, "k", "v", 8), "v_set")
      == asMap(plainSet, "s"))
    // The hot key's values really spread over the salt space in phase 1.
    val spread = df.filter($"k" === 0L)
      .select(pmod(xxhash64($"v"), lit(8L)).as("_salt"))
      .distinct().count()
    assert(spread == 8L)
  }
}
