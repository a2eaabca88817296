package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's private[sql] Column↔Expression conversions so the
  * engine's native Catalyst expressions (graft.functions.*) can surface as
  * Columns. Kept to exactly these two calls. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
