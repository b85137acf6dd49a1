package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to `private[sql]` internals needed to expose custom Catalyst
  * expressions as user-facing Columns in Spark 4 (the Column ↔
  * Expression conversion moved behind ColumnNode in 4.x and its
  * helpers are package-private). Lives in org.apache.spark.sql purely
  * for access; no Spark behavior is modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
