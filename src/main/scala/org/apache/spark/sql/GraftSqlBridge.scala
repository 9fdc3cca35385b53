package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private classic Column↔Expression
  * converters, for registering custom Catalyst expressions as user-facing
  * Columns (Spark 4 removed the public `new Column(expr)` path when Column
  * became backend-agnostic). Standard extension-library technique; no
  * Spark internals are modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
