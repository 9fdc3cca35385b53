package graft

import org.apache.spark.sql.functions._

/** Internal-consistency checks for the report-shaped operators (the
  * DuckDB oracle is the cross-engine gate; these pin the invariants that
  * survive any data).
  */
class ReportingSpec extends SparkSpec {

  test("rollup grand total equals the sum of the leaf rows") {
    import spark.implicits._
    val r = run("q53_revenue_rollup").collect()
    val grand = r.filter(x => x.getString(0) == "<all>").head
    val leaves = r.filter(x =>
      x.getString(0) != "<all>" && x.getString(1) != "<all>")
    assert(leaves.map(_.getLong(2)).sum == grand.getLong(2))
    assert(math.abs(leaves.map(_.getDouble(3)).sum - grand.getDouble(3)) < 1e-6)
    // region subtotal rows: one per region, nation = <all>
    val subs = r.filter(x => x.getString(0) != "<all>" && x.getString(1) == "<all>")
    assert(subs.map(_.getLong(2)).sum == grand.getLong(2))
  }

  test("pivot cells sum to the event count; every declared type is a column") {
    import spark.implicits._
    val p = run("q54_hourly_pivot")
    assert(operators.Reporting.eventTypes.forall(p.columns.contains))
    val cellSum = p.select(
      operators.Reporting.eventTypes.map(c => sum(col(c))).reduce(_ + _))
      .first().getLong(0)
    assert(cellSum == tables.events.count())
  }

  test("event gaps: per-user gap count is n_events - 1") {
    import spark.implicits._
    val gaps = run("q55_user_event_gaps")
      .select($"user_id", $"n_gaps").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val counts = tables.events.groupBy($"user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.filter(_._2 >= 2).forall { case (u, n) => gaps(u) == n - 1 })
    assert(counts.filter(_._2 == 1).forall { case (u, _) => !gaps.contains(u) })
  }

  test("quantity bands partition all lineitems exactly once") {
    import spark.implicits._
    val bands = run("q56_quantity_bands").collect()
    assert(bands.map(_.getLong(1)).sum == tables.lineitem.count())
  }

  test("median is partitioning-invariant and within group min/max") {
    import spark.implicits._
    val a = operators.Reporting
      .medianPricePerPriority(tables.orders.repartition(1))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = operators.Reporting
      .medianPricePerPriority(tables.orders.repartition(7))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
    val bounds = tables.orders.groupBy($"o_orderpriority")
      .agg(min($"o_totalprice"), max($"o_totalprice")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(a.forall { case (p, m) =>
      m >= bounds(p)._1 - 0.01 && m <= bounds(p)._2 + 0.01
    })
  }

  test("language id covers every doc with a prediction from the profile set") {
    import spark.implicits._
    val langs = operators.TextAnalysis.langProfiles.map(_._1).toSet
    val r = run("q58_language_id").select($"pred_lang").collect()
    assert(r.length == tables.documents.count())
    assert(r.forall(x => langs.contains(x.getString(0))))
  }

  test("source overlap: stop-shingle df cut removes uninformative shingles") {
    import spark.implicits._
    // "a b c" lives in 3 docs spanning both sources (a stop-shingle once
    // the threshold drops below its df); "u v w" is a genuine rare
    // cross-source shingle.
    val docs = Seq(
      (1L, "src0", "u v w a b c"),
      (2L, "src0", "a b c x1 x2 x3"),
      (3L, "src1", "p q r a b c"),
      (4L, "src1", "u v w p q r")).toDF("doc_id", "source", "text")
    def overlap(maxDf: Long) =
      operators.Reporting.sourceOverlap(docs, maxDf).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(overlap(10L) == Map(("src0", "src1") -> 2L))
    assert(overlap(2L) == Map(("src0", "src1") -> 1L))
  }

  test("jaccard stop-shingle cut drops pairs that only share hot shingles") {
    import spark.implicits._
    // "z z z" is in every doc (df=4): with the cut at 3 it stops counting
    // as evidence, and docs 1/2 — identical but all stop-shingle — no
    // longer pair.
    val docs = Seq(
      (1L, "z z z"),
      (2L, "z z z"),
      (3L, "z z z m1 m2 m3 m4"),
      (4L, "q1 q2 q3 z z z")).toDF("doc_id", "text")
    val noCut = operators.Dedup.jaccardNearDups(docs, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(noCut.toSet == Set((1L, 2L)))
    val cut = operators.Dedup.jaccardNearDups(docs, 0.9, maxDf = 3L)
    assert(cut.count() == 0)
  }

  // --- approx rank statistics (q71/q72) vs their exact forms at sf0.1 ---
  // The sketch guarantee under test: approx_percentile with accuracy A
  // returns an actual data element whose rank is within n/A of the target
  // rank. The bounds below are that guarantee plus explicit slack for
  // boundary ties and the one-element definitional gap between Spark's
  // interpolation target and the exact lower-median rank.

  private lazy val sf01 = Tables.load(spark, "/root/testdata/sf0.1")

  test("q71 approx median sits within sketch rank error of the true median (sf0.1)") {
    import spark.implicits._
    val approx = operators.Reporting.medianPriceApprox(sf01.orders).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val exact = operators.Reporting.medianPricePerPriority(sf01.orders).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet == exact.keySet)
    val byPrio = sf01.orders
      .select($"o_orderpriority", graft.functions.Fp.cents($"o_totalprice").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sorted }
    byPrio.foreach { case (prio, cs) =>
      val (med, nOrders) = approx(prio)
      val n = cs.length
      assert(nOrders == n, s"$prio count")
      val v = math.round(med * 100.0)
      // Rank window of the returned element: [#(< v) + 1, #(<= v)].
      val lt = cs.count(_ < v)
      val le = cs.count(_ <= v)
      assert(le > lt, s"$prio: approx median $v is not a data element")
      val tol = n.toDouble / operators.Reporting.approxAccuracy + 2
      val target = (n + 1.0) / 2
      assert(lt + 1 <= target + tol && le >= target - tol,
        s"$prio: rank window [${lt + 1}, $le] vs target $target ± $tol")
      // And the element itself can't stray outside the exact group median
      // by more than the rank-error window's value span.
      val lo = cs(math.max(0, math.ceil(target - tol).toInt - 1))
      val hi = cs(math.min(n - 1, math.floor(target + tol).toInt - 1))
      assert(v >= lo && v <= hi, s"$prio: $v outside [$lo, $hi]")
      assert(exact(prio) >= lo / 100.0 && exact(prio) <= hi / 100.0)
    }
  }

  test("q72 approx outlier flags differ from exact only within the sketch error band (sf0.1)") {
    import spark.implicits._
    val exact = operators.Reporting.lengthOutliers(sf01.documents)
      .select($"doc_id", $"source", $"n_chars", $"p95", $"outlier").collect()
    val approx = operators.Reporting.lengthOutliersApprox(sf01.documents)
      .select($"doc_id", $"source", $"n_chars", $"p95", $"outlier").collect()
    assert(exact.length == approx.length)
    val exactBy = exact.map(r => r.getLong(0) -> r).toMap
    val bySource = exact.groupBy(_.getString(1))
    approx.groupBy(_.getString(1)).foreach { case (src, rows) =>
      val lens = bySource(src).map(_.getLong(2)).sorted
      val n = lens.length
      val cutE = bySource(src).head.getLong(3)
      val cutA = rows.head.getLong(3)
      // (a) the approx cutoff is a data element with rank within n/A of
      // the exact-rank target ceil(0.95 n)
      val lt = lens.count(_ < cutA)
      val le = lens.count(_ <= cutA)
      assert(le > lt, s"$src: approx p95 $cutA is not a data element")
      val tol = n.toDouble / operators.Reporting.approxAccuracy + 2
      val target = math.ceil(n * 0.95)
      assert(lt + 1 <= target + tol && le >= target - tol,
        s"$src: rank window [${lt + 1}, $le] vs target $target ± $tol")
      // (b) flags differ only for docs strictly between the two cutoffs,
      // and the count of those is bounded by rank error + boundary ties
      val diff = rows.filter(r => exactBy(r.getLong(0)).getBoolean(4) != r.getBoolean(4))
      val lo = math.min(cutE, cutA)
      val hi = math.max(cutE, cutA)
      assert(diff.forall { r => val c = r.getLong(2); c > lo && c <= hi },
        s"$src: a flag flipped outside the cutoff band ($lo, $hi]")
      val bound = tol + lens.count(_ == cutE) + lens.count(_ == cutA)
      assert(diff.length <= bound, s"$src: ${diff.length} flips > bound $bound")
    }
  }

  test("adaptive rank statistics dispatch exact below the threshold, sketch above") {
    import spark.implicits._
    // Below threshold: the exact window-rank plan (physical Window node).
    val exactPlan = operators.Reporting
      .medianPriceAdaptive(tables.orders, exactBelow = Long.MaxValue)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Window"), exactPlan)
    assert(!exactPlan.contains("approx_percentile"), exactPlan)
    // Above threshold (forced with exactBelow = 0): one hash aggregate
    // with the percentile sketch, no window sort anywhere.
    val sketchPlan = operators.Reporting
      .medianPriceAdaptive(tables.orders, exactBelow = 0L)
      .queryExecution.optimizedPlan.toString
    assert(sketchPlan.contains("approx_percentile"), sketchPlan)
    assert(!sketchPlan.contains("Window"), sketchPlan)
    val exactPlan2 = operators.Reporting
      .lengthOutliersAdaptive(tables.documents, exactBelow = Long.MaxValue)
      .queryExecution.executedPlan.toString
    assert(exactPlan2.contains("Window"), exactPlan2)
    val sketchPlan2 = operators.Reporting
      .lengthOutliersAdaptive(tables.documents, exactBelow = 0L)
      .queryExecution.optimizedPlan.toString
    assert(sketchPlan2.contains("approx_percentile"), sketchPlan2)
    assert(!sketchPlan2.contains("Window"), sketchPlan2)
    // Both paths agree on schema, so consumers can swap freely.
    assert(operators.Reporting.medianPriceApprox(tables.orders).schema ==
      operators.Reporting.medianPricePerPriority(tables.orders).schema)
    assert(operators.Reporting.lengthOutliersApprox(tables.documents).columns.toSet ==
      operators.Reporting.lengthOutliers(tables.documents).columns.toSet)
  }

  test("cosine near-dup pairs carry exact cosines and respect the threshold") {
    import spark.implicits._
    val pairs = run("q59_cosine_neardups").collect()
    assert(pairs.forall(_.getDouble(2) >= 0.35))
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    // Every emitted pair's cosine must match the brute-force computation.
    val brute = operators.Similarity
      .cosineTopK(tables.embeddings, Int.MaxValue, Int.MaxValue)
      .select($"qid", $"nid", $"cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs.forall { r =>
      brute((r.getLong(0), r.getLong(1))) == r.getDouble(2)
    })
  }
}
