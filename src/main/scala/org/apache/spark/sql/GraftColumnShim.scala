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

  /** Re-execute a transformed logical plan (audit harnesses rebuild query
    * plans with rewritten expressions — e.g. DivAuditSpec's floor-division
    * shadow run — and need the private[sql] Dataset.ofRows to turn the
    * plan back into a DataFrame). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
