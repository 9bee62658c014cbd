package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4
  * moved `new Column(expr)` behind `classic.ExpressionUtils`). Lives in
  * the `org.apache.spark.sql` package solely for access; this is the
  * standard pattern for libraries shipping native Catalyst expressions.
  */
object GraftBridge {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
