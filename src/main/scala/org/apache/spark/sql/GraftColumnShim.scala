package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's native Catalyst expressions and the public
  * `Column` API. Spark 4 backs `Column` with `ColumnNode`s and keeps the
  * Expression⇄Column converters `private[sql]` (`ExpressionUtils` in
  * org.apache.spark.sql.classic), so library code that defines its own
  * expressions needs this one-file shim in the sql package — the same
  * pattern third-party connectors use. No behavior, just visibility.
  */
object GraftColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
