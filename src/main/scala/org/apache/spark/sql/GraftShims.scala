package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim: Spark 4's classic Column<->Expression converters are
  * `private[sql]`; extensions conventionally bridge from inside the
  * package. This is the only file outside the `graft` namespace.
  */
object GraftShims {
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
