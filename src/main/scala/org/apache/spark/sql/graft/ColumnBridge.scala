package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made `Column` wrap a `ColumnNode` and scoped the converter
  * `private[sql]`; third-party extensions commonly expose it via a small
  * shim in the `org.apache.spark.sql` namespace (same pattern as public
  * Spark-extension libraries). Everything else in this repo stays in the
  * `graft` namespace.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
