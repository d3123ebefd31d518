package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the `Column` API
  * implementation-agnostic (ColumnNode-backed) and gated the classic
  * Expression conversions behind `private[sql]` — this shim, compiled
  * into the `org.apache.spark.sql` namespace (the established pattern for
  * Spark-native extension libraries), re-exports just the two conversions
  * the engine's custom codegen expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
