package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters —
  * the sanctioned pattern for libraries that define custom Catalyst
  * expressions (the public API deliberately hides Expression since
  * Spark 4's Column became implementation-agnostic). Lives inside the
  * org.apache.spark.sql package namespace solely for access; no Spark
  * internals are modified.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
