package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to Spark's private[sql] Column ↔ Expression converters, the
  * supported way since Spark 4 moved Column onto ColumnNode. Lives in
  * the org.apache.spark.sql package solely to access them; all graft
  * code goes through [[GraftColumnBridge]]. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
