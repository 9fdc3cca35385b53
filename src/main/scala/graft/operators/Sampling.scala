package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Fp._

/** Weighted sampling operators — the reference's signature domain
  * (SURVEY.md §2.5, /root/reference/data_pipeline/utils/keyword_sampler.py
  * and the easy/medium/hard samplers).
  *
  * Design departure from the reference: the reference draws from Python's
  * global RNG, which is neither reproducible across processes nor testable.
  * Here every draw is a pure function of (tag, row key) via md5-derived
  * uniforms (graft.functions.Fp.uniform), so:
  *   - a 1000-executor run draws the same values as a laptop run,
  *   - task retries can't double-draw,
  *   - a DuckDB oracle reproduces every draw bit-for-bit,
  *   - changing the tag (seed) re-rolls everything deterministically.
  *
  * Both the Spark when-chain and the oracle CASE are generated from the
  * same weight tables, so thresholds can't drift apart.
  */
object Sampling {

  type Dict = Seq[(String, Double)]

  /** Inverse-CDF weighted choice (reference W1, keyword_sampler.py:5-14):
    * first item whose cumulative weight exceeds the uniform draw.
    */
  def weightedChoice(tag: String, key: Column, items: Dict): Column = {
    val total = items.map(_._2).sum
    val cums = items.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val u = detUniform(tag, key)
    val chain = items.init.zip(cums.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cum)) =>
        Some(acc.fold(when(u < cum, name))(_.when(u < cum, name)))
    }
    chain.fold(lit(items.last._1))(_.otherwise(items.last._1))
  }

  /** DuckDB mirror of [[weightedChoice]]; cumulative thresholds embedded
    * with Scala's round-trip Double formatting so both engines compare
    * against the identical double.
    */
  def weightedChoiceSql(tag: String, keyExpr: String, items: Dict): String = {
    val total = items.map(_._2).sum
    val cums = items.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val u = detUniformSql(tag, keyExpr)
    val whens = items.init.zip(cums.init).map { case ((name, _), cum) =>
      s"WHEN $u < CAST(${cum} AS DOUBLE) THEN '$name'"
    }.mkString(" ")
    s"CASE $whens ELSE '${items.last._1}' END"
  }

  // Weight tables (own data, shaped like the reference's keyword dicts).
  val garments: Dict = Seq(
    "tshirt" -> 0.25, "dress" -> 0.2, "jacket" -> 0.15, "jeans" -> 0.15,
    "skirt" -> 0.1, "sweater" -> 0.1, "sari" -> 0.05)
  val colors: Dict = Seq(
    "black" -> 0.3, "white" -> 0.25, "red" -> 0.15, "blue" -> 0.15,
    "green" -> 0.1, "yellow" -> 0.05)
  val styles: Dict = Seq(
    "casual" -> 0.5, "formal" -> 0.3, "sport" -> 0.2)

  /** 2-level hierarchy (reference W8 recursive descent / W2 site dict). */
  val hierarchy: Seq[(String, Double, Dict)] = Seq(
    ("tops", 0.4, Seq("tshirt" -> 0.5, "shirt" -> 0.3, "sweater" -> 0.2)),
    ("bottoms", 0.35, Seq("jeans" -> 0.5, "skirt" -> 0.3, "shorts" -> 0.2)),
    ("outerwear", 0.25, Seq("jacket" -> 0.6, "coat" -> 0.4)))

  /** Bernoulli-inclusion categories with weights (reference W5/W6
    * easy/medium samplers).
    */
  val attributes: Dict = Seq(
    "color" -> 0.9, "fabric" -> 0.7, "style" -> 0.5, "season" -> 0.3,
    "brand" -> 0.2, "fit" -> 0.6)

  /** W1/W9: assemble a multi-component sampled record per input row. The
    * largest dict goes through the native O(log n) WeightedBucket
    * expression (same semantics as the when-chain — equivalence is
    * spec-tested, and the shared oracle CASE checks both).
    */
  def sampledRecord(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(
      $"doc_id",
      graft.functions.WeightedBucket(
        detUniform("w1g", $"doc_id"), garments).as("garment"),
      weightedChoice("w1c", $"doc_id", colors).as("color"),
      weightedChoice("w1s", $"doc_id", styles).as("style"))
  }

  /** W8/W2: hierarchical descent — category ∝ category prob, then item ∝
    * item prob within the chosen category; independent uniforms per level.
    */
  def hierarchicalSample(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val cat = weightedChoice("w8a", $"doc_id",
      hierarchy.map { case (n, p, _) => n -> p })
    val item = hierarchy.init.foldLeft(Option.empty[Column]) {
        case (acc, (name, _, items)) =>
          val pick = weightedChoice("w8b", $"doc_id", items)
          Some(acc.fold(when(cat === name, pick))(_.when(cat === name, pick)))
      }.map(_.otherwise(
        weightedChoice("w8b", $"doc_id", hierarchy.last._3)))
      .get
    docs.select($"doc_id", cat.as("category"), item.as("item"))
  }

  /** W5+W6: independent Bernoulli inclusion per category, topped up to at
    * least `minK` categories via Efraimidis–Spirakis weighted sampling
    * without replacement (rank by u^(1/w) descending) over the excluded
    * categories — one pass, no iteration, reproduces sequential
    * weighted-draws-without-replacement exactly in distribution.
    */
  def bernoulliTopup(docs: DataFrame, minK: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val spark = docs.sparkSession
    val cats = spark.createDataFrame(attributes).toDF("category", "p")
    val key = concat_ws(":", $"doc_id", $"category")
    val crossed = docs.select($"doc_id").crossJoin(broadcast(cats))
      .withColumn("included", detUniform("w5", key) < $"p")
      .withColumn("es_key", pow(detUniform("w6", key), lit(1.0) / $"p"))
    val wCnt = Window.partitionBy($"doc_id")
    val wRank = Window.partitionBy($"doc_id", $"included")
      .orderBy($"es_key".desc, $"category".asc)
    crossed
      .withColumn("n_inc", sum($"included".cast("long")).over(wCnt))
      .withColumn("rk", row_number().over(wRank))
      .filter($"included" || $"rk" <= lit(minK) - $"n_inc")
      .select($"doc_id", $"category",
        when($"included", "bernoulli").otherwise("topup").as("via"))
  }

  /** W6 at scale: weighted reservoir sample of k ids per group via the
    * single-pass Aggregator (graft.functions.WeightedReservoir) — the
    * oracle checks it against the full window formulation.
    */
  def weightedReservoirPerType(events: DataFrame, k: Int): DataFrame = {
    import events.sparkSession.implicits._
    val esKey = pow(detUniform("res", $"event_id"),
      lit(1.0) / ($"value" + lit(1.0)))
    events.groupBy($"event_type")
      .agg(array_join(transform(
        graft.functions.WeightedReservoir.sample(k)(esKey, $"event_id"),
        _.cast("string")), ",").as("sample_ids"))
  }

  /** W10 polymorphic per-category rules (reference
    * people_western_keyword_extractor.py:57-124): each category kind
    * yields a differently-shaped draw — plain weighted; weighted primary +
    * uniform secondary from a per-primary list. Flattened to
    * (doc_id, category, value, extra) rows.
    */
  val bodyTypes: Dict = Seq("slim" -> 0.3, "athletic" -> 0.4, "curvy" -> 0.3)
  val countries: Seq[(String, Double, Seq[String])] = Seq(
    ("india", 0.5, Seq("hindi", "tamil", "bengali")),
    ("usa", 0.3, Seq("caucasian", "hispanic", "african_american")),
    ("japan", 0.2, Seq("japanese")))
  val genders: Seq[(String, Double, Seq[String])] = Seq(
    ("female", 0.6, Seq("dress", "saree", "top")),
    ("male", 0.4, Seq("kurta", "shirt")))

  /** Uniform pick from a literal list via a deterministic uniform. */
  private def uniformPick(u: Column, items: Seq[String]): Column =
    element_at(array(items.map(lit): _*),
      (floor(u * items.size) + 1).cast("int"))

  private def uniformPickSql(uExpr: String, items: Seq[String]): String = {
    val lst = items.map(i => s"'$i'").mkString("[", ", ", "]")
    s"($lst)[CAST(floor($uExpr * ${items.size}) + 1 AS BIGINT)]"
  }

  def polymorphicSample(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val base = docs.select($"doc_id")
    val body = base.select($"doc_id", lit("body_type").as("category"),
      weightedChoice("w10b", $"doc_id", bodyTypes).as("value"),
      lit(null).cast("string").as("extra"))
    def twoLevel(tag: String, cat: String,
        table: Seq[(String, Double, Seq[String])]) = {
      val primary = weightedChoice(tag, $"doc_id",
        table.map { case (n, p, _) => n -> p })
      val u2 = detUniform(tag + "x", $"doc_id")
      val extra = table.init.foldLeft(Option.empty[Column]) {
          case (acc, (name, _, subs)) =>
            val pick = uniformPick(u2, subs)
            Some(acc.fold(when(primary === name, pick))(
              _.when(primary === name, pick)))
        }.map(_.otherwise(uniformPick(u2, table.last._3))).get
      base.select($"doc_id", lit(cat).as("category"), primary.as("value"),
        extra.as("extra"))
    }
    body
      .unionByName(twoLevel("w10c", "country", countries))
      .unionByName(twoLevel("w10g", "gender", genders))
  }

  /** R6 deterministic shuffle: a stable pseudo-random permutation from
    * hash-derived keys (reference uses DataLoader shuffle=True; ours is
    * reproducible and partition-independent).
    *
    * Positions come from a parallel range-partitioned sort plus
    * zipWithIndex (global offsets from per-partition counts) — NOT
    * row_number() over an empty-partition Window, which funnels the
    * whole corpus through one task. The sort key (u, doc_id) is a total
    * order, so the permutation is identical under any partitioning.
    */
  def deterministicShuffle(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val spark = docs.sparkSession
    val sorted = docs
      .select($"doc_id", detUniform("shuf", $"doc_id").as("u"))
      .orderBy($"u".asc, $"doc_id".asc)
      .select($"doc_id")
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => (r.getLong(0), i + 1) }
    spark.createDataFrame(rdd).toDF("doc_id", "pos")
  }

  /** Stable train/val/test split: membership is a pure function of the
    * row key (hash threshold), so it survives reruns, repartitioning, and
    * corpus growth — new rows join a split without moving old ones. The
    * canonical training-data split operator; output is the per-(split,
    * lang) census a pipeline reports.
    */
  def splitCensus(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val u = detUniform("split", $"doc_id")
    docs
      .withColumn("split",
        when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n"))
  }

  /** Data-mixture construction under a per-source budget: take documents
    * per source in deterministic hash order until the source's cumulative
    * character count reaches `budget` (a document is taken while the
    * running total BEFORE it is under budget, so every non-empty source
    * contributes at least one document).
    *
    * This is how pre-training mixtures are actually cut: a stable
    * pseudo-random order (reruns over the same corpus pick the same
    * docs; growth inserts new candidates uniformly into the order, so
    * the cut line itself only moves where new docs land before it) and
    * a running-sum window partitioned by source — parallelism scales
    * with source count, no global ordering anywhere.
    */
  def tokenBudgetMixture(docs: DataFrame, budget: Long): DataFrame = {
    import docs.sparkSession.implicits._
    val w = Window.partitionBy($"source")
      .orderBy(detUniform("mix", $"doc_id").asc, $"doc_id".asc)
    docs.select($"doc_id", $"source", $"n_chars")
      .withColumn("cum_before",
        coalesce(sum($"n_chars").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter($"cum_before" < budget)
  }

  /** Sequence packing: assign every document to a fixed-budget pack —
    * the batch-construction step that turns a curated corpus into
    * training sequences. Documents are ordered by a stable hash draw
    * (same doctrine as [[tokenBudgetMixture]]: reruns pack identically,
    * corpus growth only perturbs packs after the insertion point) and
    * chunked by cumulative size: pack = cum_chars_before div budget, so
    * each pack's payload is ≤ budget plus at most one document's
    * overflow — the standard streaming-greedy approximation of bin
    * packing, expressible as one window.
    *
    * Scale shape: a GLOBAL running sum would serialize on one task (the
    * WindowExec all-to-one-partition trap), so packing is bucketed: a
    * deterministic hash of doc_id scatters documents over `nBuckets`
    * independent packing streams, the window partitions by bucket, and
    * parallelism = nBuckets (set it to the cluster's task budget at
    * scale; packs are (bucket, pack) pairs, never global ordinals).
    */
  def packDocuments(docs: DataFrame, budget: Long,
      nBuckets: Int = 32): DataFrame = {
    import docs.sparkSession.implicits._
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val w = Window.partitionBy($"bucket")
      .orderBy(detUniform("pack", $"doc_id").asc, $"doc_id".asc)
    docs.select($"doc_id", $"n_chars")
      // detHash32 is in [0, 2^32): plain mod IS pmod, in both engines.
      .withColumn("bucket",
        pmod(detHash32("packb", $"doc_id"), lit(nBuckets.toLong)))
      .withColumn("cum_before",
        coalesce(sum($"n_chars").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // Integer div, not floor(double /): exact at any cumulative size.
      .withColumn("pack", expr(s"cum_before div ${budget}L"))
      .select($"doc_id", $"bucket", $"pack")
  }

  /** Temperature-scaled source mixing at α = 0.5 — the multilingual /
    * multi-source rebalancing step (the p_s ∝ mass_s^α schedule of
    * XLM-R/mT5): low-resource sources are upsampled relative to their
    * natural share, high-resource sources downsampled, and α = 0.5 is the
    * standard setting — also the only exponent with a cross-engine-exact
    * implementation, since IEEE sqrt is correctly rounded everywhere
    * while pow/exp/ln are not. Weights are quantized to 1e-6 fixed point
    * before normalization so the per-source quota is a deterministic
    * integer in any engine.
    *
    * Each source's quota is floor(budget · w_s/Σw), filled by the first
    * quota documents under the hash-draw order — the same stateless draw
    * as every sampler here, so reruns, retries, and the oracle agree.
    *
    * Scale shape: the weight table is one row per source (broadcast
    * back); quota fill is rank-within-source — one shuffle on source,
    * the same R4-quota window shape as q31. A severely skewed source
    * histogram would funnel the dominant source through one task; that
    * is the regime [[Skew.saltedJoin]]'s two-phase trick covers, and at
    * α = 0.5 the dominant source's QUOTA is already sublinear in its
    * mass, so the selected output cannot be source-skewed even when the
    * input is.
    */
  def temperatureSample(docs: DataFrame, budget: Long): DataFrame = {
    import docs.sparkSession.implicits._
    require(budget >= 0, s"budget must be >= 0, got $budget")
    // One row per source: the all-to-one window normalization is over
    // the tiny aggregate, never the corpus.
    val quotas = docs.groupBy($"source")
      .agg(sum($"n_chars").as("mass"))
      .withColumn("wgt", floor(sqrt($"mass".cast("double")) * 1e6).cast("long"))
      .withColumn("n_take",
        floor(lit(budget.toDouble) *
          ($"wgt".cast("double") /
            sum($"wgt").over(Window.partitionBy()).cast("double")))
          .cast("long"))
      .select($"source", $"n_take")
    val w = Window.partitionBy($"source")
      .orderBy(detUniform("temp", $"doc_id").asc, $"doc_id".asc)
    docs.select($"doc_id", $"source")
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), "source")
      .filter($"rk" <= $"n_take")
      .select($"doc_id", $"source", $"rk")
  }

  def temperatureSampleSql(budget: Long): String = {
    val u = detUniformSql("temp", "doc_id")
    s"""WITH m AS (
       |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass
       |  FROM documents GROUP BY source),
       |w AS (
       |  SELECT source,
       |    CAST(FLOOR(SQRT(CAST(mass AS DOUBLE)) * 1000000.0) AS BIGINT) AS wgt
       |  FROM m),
       |n AS (
       |  SELECT source, CAST(FLOOR($budget.0 * (CAST(wgt AS DOUBLE)
       |    / CAST(CAST(SUM(wgt) OVER () AS BIGINT) AS DOUBLE))) AS BIGINT) AS n_take
       |  FROM w),
       |r AS (
       |  SELECT doc_id, source,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY $u ASC, doc_id ASC) AS BIGINT) AS rk
       |  FROM documents)
       |SELECT r.doc_id, r.source, r.rk
       |FROM r JOIN n USING (source) WHERE rk <= n_take""".stripMargin
  }

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q34_sampled_record" -> ((s, d) => sampledRecord(Tables.load(s, d).documents)),
    "q35_hierarchical_sample" -> ((s, d) =>
      hierarchicalSample(Tables.load(s, d).documents)),
    "q36_bernoulli_topup" -> ((s, d) =>
      bernoulliTopup(Tables.load(s, d).documents, 4)),
    "q45_weighted_reservoir" -> ((s, d) =>
      weightedReservoirPerType(Tables.load(s, d).events, 5)),
    "q48_polymorphic_sample" -> ((s, d) =>
      polymorphicSample(Tables.load(s, d).documents)),
    "q49_deterministic_shuffle" -> ((s, d) =>
      deterministicShuffle(Tables.load(s, d).documents)),
    "q62_split_census" -> ((s, d) => splitCensus(Tables.load(s, d).documents)),
    "q66_token_budget_mixture" -> ((s, d) =>
      tokenBudgetMixture(Tables.load(s, d).documents, 3000)),
    // Budget ~4 documents' chars, 8 buckets: multiple packs per bucket
    // at verify scale, so the chunking arithmetic is actually exercised.
    "q84_doc_packing" -> ((s, d) =>
      packDocuments(Tables.load(s, d).documents, 2000, nBuckets = 8)),
    // Budget 300 of 500 docs: every source's quota binds (uniform doc
    // counts but varying char mass, so quotas differ source-to-source).
    "q86_temperature_mix" -> ((s, d) =>
      temperatureSample(Tables.load(s, d).documents, 300))
  )

  def oracles: Map[String, String] = Map(
    "q86_temperature_mix" -> temperatureSampleSql(300),
    "q84_doc_packing" -> {
      val u = detUniformSql("pack", "doc_id")
      val b = s"(${detHash32Sql("packb", "doc_id")} % 8)"
      s"""SELECT doc_id, bucket, cum_before // 2000 AS pack FROM (
         |  SELECT doc_id, $b AS bucket,
         |    CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY $b
         |      ORDER BY $u ASC, doc_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_before
         |  FROM documents)""".stripMargin
    },
    "q66_token_budget_mixture" -> {
      val u = detUniformSql("mix", "doc_id")
      s"""SELECT doc_id, source, n_chars, cum_before FROM (
         |  SELECT doc_id, source, n_chars,
         |    CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY source
         |      ORDER BY $u ASC, doc_id ASC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS cum_before
         |  FROM documents)
         |WHERE cum_before < 3000""".stripMargin
    },
    "q62_split_census" -> {
      val u = detUniformSql("split", "doc_id")
      s"""SELECT CASE WHEN $u < CAST(0.8 AS DOUBLE) THEN 'train'
         |            WHEN $u < CAST(0.9 AS DOUBLE) THEN 'val'
         |            ELSE 'test' END AS split,
         |  lang, COUNT(*) AS n
         |FROM documents GROUP BY 1, 2""".stripMargin
    },
    "q48_polymorphic_sample" -> {
      def two(tag: String, cat: String,
          table: Seq[(String, Double, Seq[String])]): String = {
        val primary = weightedChoiceSql(tag, "doc_id",
          table.map { case (n, p, _) => n -> p })
        val u2 = detUniformSql(tag + "x", "doc_id")
        val whens = table.init.map { case (name, _, subs) =>
          s"WHEN ($primary) = '$name' THEN ${uniformPickSql(u2, subs)}"
        }.mkString(" ")
        val els = uniformPickSql(u2, table.last._3)
        s"""SELECT doc_id, '$cat' AS category, $primary AS value,
           |  CASE $whens ELSE $els END AS extra FROM documents""".stripMargin
      }
      s"""SELECT doc_id, 'body_type' AS category,
         |  ${weightedChoiceSql("w10b", "doc_id", bodyTypes)} AS value,
         |  CAST(NULL AS VARCHAR) AS extra FROM documents
         |UNION ALL
         |${two("w10c", "country", countries)}
         |UNION ALL
         |${two("w10g", "gender", genders)}""".stripMargin
    },
    "q49_deterministic_shuffle" ->
      s"""SELECT doc_id,
         |  CAST(ROW_NUMBER() OVER (ORDER BY ${detUniformSql("shuf", "doc_id")} ASC, doc_id ASC) AS BIGINT) AS pos
         |FROM documents""".stripMargin,
    "q34_sampled_record" ->
      s"""SELECT doc_id,
         |  ${weightedChoiceSql("w1g", "doc_id", garments)} AS garment,
         |  ${weightedChoiceSql("w1c", "doc_id", colors)} AS color,
         |  ${weightedChoiceSql("w1s", "doc_id", styles)} AS style
         |FROM documents""".stripMargin,
    "q35_hierarchical_sample" -> {
      val catSql = weightedChoiceSql("w8a", "doc_id",
        hierarchy.map { case (n, p, _) => n -> p })
      val itemWhens = hierarchy.init.map { case (name, _, items) =>
        s"WHEN ($catSql) = '$name' THEN ${weightedChoiceSql("w8b", "doc_id", items)}"
      }.mkString(" ")
      val itemElse = weightedChoiceSql("w8b", "doc_id", hierarchy.last._3)
      s"""SELECT doc_id, $catSql AS category,
         |  CASE $itemWhens ELSE $itemElse END AS item
         |FROM documents""".stripMargin
    },
    "q45_weighted_reservoir" -> {
      val u = detUniformSql("res", "event_id")
      s"""SELECT event_type,
         |  array_to_string(
         |    (list(event_id ORDER BY pow($u, 1.0 / (value + 1.0)) DESC, event_id ASC))[1:5],
         |    ',') AS sample_ids
         |FROM events GROUP BY event_type""".stripMargin
    },
    "q36_bernoulli_topup" -> {
      val values = attributes.map { case (n, p) =>
        s"('$n', CAST($p AS DOUBLE))"
      }.mkString(", ")
      val key = "CAST(doc_id AS VARCHAR) || ':' || category"
      s"""WITH cats(category, p) AS (VALUES $values),
         |crossed AS (
         |  SELECT doc_id, category, p,
         |    ${detUniformSql("w5", key)} < p AS included,
         |    pow(${detUniformSql("w6", key)}, 1.0 / p) AS es_key
         |  FROM (SELECT doc_id FROM documents) CROSS JOIN cats),
         |ranked AS (
         |  SELECT doc_id, category, included,
         |    CAST(SUM(CASE WHEN included THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id) AS BIGINT) AS n_inc,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id, included
         |      ORDER BY es_key DESC, category ASC) AS rk
         |  FROM crossed)
         |SELECT doc_id, category,
         |  CASE WHEN included THEN 'bernoulli' ELSE 'topup' END AS via
         |FROM ranked WHERE included OR rk <= 4 - n_inc""".stripMargin
    }
  )
}
