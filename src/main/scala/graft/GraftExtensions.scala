package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.{DotQ, IntersectCountSorted, WeightedBucket}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions for the SQL surface, so
  * `spark.sql("... weighted_bucket(u, array('a','b'), array(0.5,0.5))")`
  * works next to the Column API. Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("weighted_bucket"),
      new ExpressionInfo(classOf[WeightedBucket].getName, "weighted_bucket"),
      (exprs: Seq[Expression]) => GraftExtensions.buildWeightedBucket(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotQ].getName, "dot_q"),
      (exprs: Seq[Expression]) => GraftExtensions.buildDotQ(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("intersect_count_sorted"),
      new ExpressionInfo(classOf[IntersectCountSorted].getName,
        "intersect_count_sorted"),
      (exprs: Seq[Expression]) => GraftExtensions.buildIntersect(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("pii_redact"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace].getName,
        "pii_redact"),
      (exprs: Seq[Expression]) => GraftExtensions.buildPiiRedact(exprs)))
    ext.injectTableFunction((
      new FunctionIdentifier("ann_topk_auto"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "ann_topk_auto"),
      (exprs: Seq[Expression]) => GraftExtensions.buildAnnTopKAuto(exprs)))
    ext.injectTableFunction((
      new FunctionIdentifier("simhash_near_pairs"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "simhash_near_pairs"),
      (exprs: Seq[Expression]) => GraftExtensions.buildSimhashNearPairs(exprs)))
    ext.injectTableFunction((
      new FunctionIdentifier("semantic_dedup"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "semantic_dedup"),
      (exprs: Seq[Expression]) => GraftExtensions.buildSemanticDedup(exprs)))
    ext.injectTableFunction((
      new FunctionIdentifier("gate_decisions"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "gate_decisions"),
      (exprs: Seq[Expression]) => GraftExtensions.buildGateDecisions(exprs)))
  }
}

object GraftExtensions {

  /** Register the engine's SQL functions on an already-built session
    * (extensions classes only apply at session build time).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("weighted_bucket"),
      new ExpressionInfo(classOf[WeightedBucket].getName, "weighted_bucket"),
      (exprs: Seq[Expression]) => buildWeightedBucket(exprs))
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotQ].getName, "dot_q"),
      (exprs: Seq[Expression]) => buildDotQ(exprs))
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("intersect_count_sorted"),
      new ExpressionInfo(classOf[IntersectCountSorted].getName,
        "intersect_count_sorted"),
      (exprs: Seq[Expression]) => buildIntersect(exprs))
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier("pii_redact"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace].getName,
        "pii_redact"),
      (exprs: Seq[Expression]) => buildPiiRedact(exprs))
    spark.sessionState.tableFunctionRegistry.registerFunction(
      new FunctionIdentifier("ann_topk_auto"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "ann_topk_auto"),
      (exprs: Seq[Expression]) => buildAnnTopKAuto(exprs))
    spark.sessionState.tableFunctionRegistry.registerFunction(
      new FunctionIdentifier("simhash_near_pairs"),
      new ExpressionInfo(GraftExtensions.getClass.getName,
        "simhash_near_pairs"),
      (exprs: Seq[Expression]) => buildSimhashNearPairs(exprs))
    spark.sessionState.tableFunctionRegistry.registerFunction(
      new FunctionIdentifier("semantic_dedup"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "semantic_dedup"),
      (exprs: Seq[Expression]) => buildSemanticDedup(exprs))
    spark.sessionState.tableFunctionRegistry.registerFunction(
      new FunctionIdentifier("gate_decisions"),
      new ExpressionInfo(GraftExtensions.getClass.getName, "gate_decisions"),
      (exprs: Seq[Expression]) => buildGateDecisions(exprs))
  }

  /** SQL table-function builder:
    * `ann_topk_auto('view_name', n_queries, k, target_recall)` — the
    * recall-targeted ANN entry point
    * ([[graft.operators.Similarity.cosineTopKAuto]]) reachable from pure
    * SQL: `SELECT * FROM ann_topk_auto('embeddings_v', 10, 3, 0.9)`.
    *
    * The builder is macro expansion at analysis time: arguments must be
    * literals (the view name names the (vec_id, embedding) relation —
    * a table function cannot take a relation-typed argument in SQL),
    * and the expansion RUNS the operator's driver-side phases (corpus
    * count → [[graft.operators.Similarity.annParams]] geometry →
    * capped k-means/PQ training collects) before returning the serve
    * plan, exactly as the Column-API call does eagerly. The returned
    * plan is the operator's analyzed serve plan — (qid, nid, cos, rk) —
    * so SQL callers compose it (joins, filters, CTEs) like any relation.
    */
  private def asInt(e: Expression): Int = e.eval() match {
    case i: java.lang.Integer => i.intValue()
    case l: java.lang.Long => l.intValue()
    case d: org.apache.spark.sql.types.Decimal => d.toInt
    case other => throw new IllegalArgumentException(
      s"expected an integer literal, got $other")
  }

  private def asDouble(e: Expression): Double = e.eval() match {
    case d: java.lang.Double => d.doubleValue()
    case f: java.lang.Float => f.doubleValue()
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case i: java.lang.Integer => i.doubleValue()
    case other => throw new IllegalArgumentException(
      s"expected a numeric literal, got $other")
  }

  private[graft] def buildAnnTopKAuto(
      exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(exprs.length == 4 && exprs.forall(_.foldable),
      "ann_topk_auto(view STRING, n_queries INT, k INT, " +
        "target_recall DOUBLE) — all arguments must be literals")
    val view = exprs.head.eval().toString
    val spark = org.apache.spark.sql.SparkSession.active
    graft.operators.Similarity.cosineTopKAuto(spark.table(view),
        asInt(exprs(1)), asInt(exprs(2)), targetRecall = asDouble(exprs(3)))
      .queryExecution.analyzed
  }

  /** SQL table-function builder:
    * `simhash_near_pairs('view_name', max_dist, bits)` — exact
    * hamming-≤maxDist near-duplicate pairs over a (doc_id, text) view
    * ([[graft.operators.Dedup.simhashNearPairs]]) from pure SQL:
    * `SELECT * FROM simhash_near_pairs('documents_v', 5, 60)`. Same
    * macro-expansion contract as [[buildAnnTopKAuto]]: literal
    * arguments, returns the operator's analyzed (doc_a, doc_b, hamming)
    * plan — the pigeonhole multi-index join, never an O(n²) self-join —
    * composable like any relation.
    */
  private[graft] def buildSimhashNearPairs(
      exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(exprs.length == 3 && exprs.forall(_.foldable),
      "simhash_near_pairs(view STRING, max_dist INT, bits INT) — " +
        "all arguments must be literals")
    val view = exprs.head.eval().toString
    val spark = org.apache.spark.sql.SparkSession.active
    graft.operators.Dedup.simhashNearPairs(spark.table(view),
        maxDist = asInt(exprs(1)), bits = asInt(exprs(2)))
      .queryExecution.analyzed
  }

  /** SQL table-function builder:
    * `semantic_dedup('view_name', min_cos)` — the auto-sized SemDeDup
    * verdict relation ([[graft.operators.Similarity.semanticDedup]])
    * from pure SQL:
    * `SELECT * FROM semantic_dedup('embeddings_v', 0.35) WHERE kept`.
    * The expansion runs the operator's driver-side phases (corpus count
    * → √n nlist → capped hash-seeded Lloyd training) at analysis time,
    * then returns the analyzed (vec_id, list_id, kept) serve plan.
    */
  private[graft] def buildSemanticDedup(
      exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(exprs.length == 2 && exprs.forall(_.foldable),
      "semantic_dedup(view STRING, min_cos DOUBLE) — " +
        "all arguments must be literals")
    val view = exprs.head.eval().toString
    val spark = org.apache.spark.sql.SparkSession.active
    graft.operators.Similarity.semanticDedup(spark.table(view),
        minCos = asDouble(exprs(1)))
      .queryExecution.analyzed
  }

  /** SQL table-function builder:
    * `gate_decisions('state_dir', 'docs_view', 'emb_view'[, min_cos[,
    * nprobe]])` — the composed three-tier ingest gate
    * ([[graft.operators.IngestGate.gate]]) over state persisted by
    * [[graft.operators.IngestGate.saveState]], from pure SQL:
    * `SELECT * FROM gate_decisions('/state', 'batch_v', 'emb_v')
    * WHERE stage <> 'pass'`. Same macro-expansion contract as the
    * other table functions: literal arguments, analysis-time
    * [[graft.operators.IngestGate.loadState]] of the parquet state
    * (width + radius ride in its meta table, so the SQL caller needs
    * no policy knowledge), and the returned plan is the gate's
    * analyzed (doc_id, stage, dup_of) decision relation, composable
    * like any relation. maxDist/minShingles always come from the
    * persisted state's policy — the auto-policy showcase; min_cos
    * (default 0.9) and nprobe (default 4) tune the embedding tier.
    */
  private[graft] def buildGateDecisions(
      exprs: Seq[Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    require(exprs.length >= 3 && exprs.length <= 5 &&
        exprs.forall(_.foldable),
      "gate_decisions(state_dir STRING, docs_view STRING, emb_view " +
        "STRING[, min_cos DOUBLE[, nprobe INT]]) — all arguments must " +
        "be literals")
    val spark = org.apache.spark.sql.SparkSession.active
    val state = graft.operators.IngestGate.loadState(spark,
      exprs.head.eval().toString)
    val docs = spark.table(exprs(1).eval().toString)
    val emb = spark.table(exprs(2).eval().toString)
    val minCos = if (exprs.length >= 4) asDouble(exprs(3)) else 0.9
    val nprobe = if (exprs.length >= 5) asInt(exprs(4)) else 4
    graft.operators.IngestGate.gate(state, docs, emb, minCos = minCos,
        nprobe = nprobe)
      .queryExecution.analyzed
  }

  /** SQL builder: pii_redact(text) — the ordered email→IP→phone scrub of
    * graft.operators.TextAnalysis.piiRedact, composed from the built-in
    * codegen RegExpReplace so SQL callers get the identical semantics.
    */
  private[graft] def buildPiiRedact(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "pii_redact(text STRING)")
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
    import graft.operators.TextAnalysis
    Seq(TextAnalysis.emailRe -> "<EMAIL>", TextAnalysis.ipv4Re -> "<IP>",
        TextAnalysis.phoneRe -> "<PHONE>")
      .foldLeft(exprs.head) { case (e, (re, rep)) =>
        RegExpReplace(e, Literal(re), Literal(rep))
      }
  }

  /** SQL builder: intersect_count_sorted(a, b) over sorted-distinct
    * ARRAY<BIGINT> (see graft.functions.IntersectCountSorted).
    */
  private[graft] def buildIntersect(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "intersect_count_sorted(a ARRAY<BIGINT>, b ARRAY<BIGINT>)")
    IntersectCountSorted(exprs.head, exprs.last)
  }

  /** SQL builder: dot_q(array<long>, array<long>) — exact integer dot
    * product (see graft.functions.DotQ).
    */
  private[graft] def buildDotQ(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "dot_q(a ARRAY<BIGINT>, b ARRAY<BIGINT>)")
    DotQ(exprs.head, exprs.last)
  }

  /** SQL builder: weighted_bucket(u, items_array, weights_array) with
    * foldable literal arrays (dictionaries are literals by design — they
    * broadcast with the plan).
    */
  private[graft] def buildWeightedBucket(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      "weighted_bucket(u DOUBLE, items ARRAY<STRING>, weights ARRAY<DOUBLE>)")
    val Seq(u, itemsE, weightsE) = exprs
    require(itemsE.foldable && weightsE.foldable,
      "weighted_bucket items/weights must be literal arrays")
    val items = itemsE.eval().asInstanceOf[ArrayData]
      .toObjectArray(StringType).map(_.toString)
    // SQL numeric literals arrive as DECIMAL; accept any numeric element
    // type and normalize to double.
    val weightElemType = weightsE.dataType.asInstanceOf[ArrayType].elementType
    val weights = weightsE.eval().asInstanceOf[ArrayData]
      .toObjectArray(weightElemType).map {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
        case l: java.lang.Long => l.doubleValue()
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case other => throw new IllegalArgumentException(
          s"weighted_bucket weights must be numeric, got $other")
      }
    require(items.length == weights.length && items.nonEmpty,
      "items and weights must be same-length, non-empty")
    val total = weights.sum
    val cums = weights.scanLeft(0.0)(_ + _).tail.map(_ / total)
    // SQL callers pass DECIMAL literals (e.g. 0.5); cast at analysis time
    // instead of a runtime ClassCastException inside eval/codegen.
    val uDouble =
      if (u.dataType == DoubleType) u
      else org.apache.spark.sql.catalyst.expressions.Cast(u, DoubleType)
    WeightedBucket(uDouble, cums.init, items)
  }
}
