package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for inverse-CDF weighted choice over a large
  * item table: binary search on the precomputed cumulative thresholds.
  *
  * Why an Expression and not a when-chain (graft.operators.Sampling
  * builds one for small dicts): a CASE chain is O(n) comparisons per row
  * and its generated code grows linearly with the dictionary — at the
  * reference's dictionary sizes (hundreds of weighted keywords,
  * /root/reference/data_pipeline/utils/keywords_dictionary.py:1-279) that
  * both bloats codegen (risking the 64KB method limit and codegen
  * fallback) and burns O(n) branches per row. This expression is O(log n)
  * via Arrays.binarySearch with the threshold array held as a single
  * reference object, and participates in whole-stage codegen.
  *
  * Semantics match the when-chain exactly: item i is chosen when
  * u < cums(i) and u >= cums(i-1); the last item absorbs the tail.
  */
case class WeightedBucket(child: Expression, cums: Array[Double],
    items: Array[String]) extends UnaryExpression {
  require(cums.length == items.length - 1,
    "cums are the n-1 internal thresholds; the last item absorbs the tail")

  override def dataType: DataType = StringType
  override def prettyName: String = "weighted_bucket"

  @transient private lazy val utf8Items: Array[UTF8String] =
    items.map(UTF8String.fromString)

  /** First index whose threshold exceeds u (strict), else the last item.
    * Zero-weight items create duplicate thresholds, and binarySearch
    * returns an arbitrary index among equals — advance past every
    * threshold <= u so an exact-equality hit can never select a
    * probability-zero bucket (the when-chain/oracle CASE semantics).
    */
  private def pick(u: Double): Int = {
    val r = java.util.Arrays.binarySearch(cums, u)
    var i = if (r >= 0) r else -r - 1
    while (i < cums.length && cums(i) <= u) i += 1
    i
  }

  override def nullSafeEval(input: Any): Any =
    utf8Items(pick(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cumsRef = ctx.addReferenceObj("cums", cums, "double[]")
    val itemsRef = ctx.addReferenceObj("items", utf8Items,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, u => {
      val r = ctx.freshName("r")
      s"""
         |int $r = java.util.Arrays.binarySearch($cumsRef, $u);
         |$r = ($r >= 0) ? $r : -$r - 1;
         |while ($r < $cumsRef.length && $cumsRef[$r] <= $u) { $r++; }
         |${ev.value} = $itemsRef[$r];
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WeightedBucket {

  /** Column builder from an (item, weight) table: normalizes weights to
    * the n-1 internal cumulative thresholds.
    */
  def apply(u: Column, items: Seq[(String, Double)]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    val total = items.map(_._2).sum
    val cums = items.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    // Cast here (not declared inputTypes — AbstractDataType is private in
    // Spark 4) so non-double inputs resolve instead of failing in codegen.
    GraftSqlBridge.column(WeightedBucket(
      GraftSqlBridge.expression(u.cast("double")),
      cums.init.toArray, items.map(_._1).toArray))
  }
}
