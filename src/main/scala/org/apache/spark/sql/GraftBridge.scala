package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface: Spark 4 backs `Column` by ColumnNode
  * (Connect-compatible), so turning a raw Catalyst `Expression` into a
  * `Column` goes through `classic.ExpressionUtils`. Extension libraries
  * conventionally host this one-liner inside the `org.apache.spark.sql`
  * package.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
