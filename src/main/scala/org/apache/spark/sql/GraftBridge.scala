package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's package-private Column⇄Expression converters
  * (Spark 4 moved Column onto ColumnNode; libraries adding custom
  * Catalyst expressions need these two hops — the same pattern public
  * Spark-extension projects use). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
