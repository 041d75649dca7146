package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column↔Expression bridge for custom Catalyst expressions. Spark 4 made
  * the classic conversion helpers `private[sql]`; this shim lives in the
  * `org.apache.spark.sql` package solely to re-export the two conversions
  * the engine's native expressions need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
