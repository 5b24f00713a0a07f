package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between `Column` (sql-api) and Catalyst `Expression` for the
  * classic (non-Connect) runtime — Spark 4 moved `Column` to a plan-node
  * representation, so custom expressions convert through the
  * [[org.apache.spark.sql.GraftShims]] package shim.
  */
object ColumnOps {
  def expr(c: Column): Expression = GraftShims.expression(c)
  def toColumn(f: Expression => Expression)(c: Column): Column =
    GraftShims.column(f(expr(c)))
  def toColumn2(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    GraftShims.column(f(expr(a), expr(b)))
}
