package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's `private[sql]` Column↔Expression conversion —
  * the supported path for exposing a custom Catalyst `Expression`
  * through the public Column API (the Column(expr) constructor of
  * Spark 3 is internal in 4.x). Lives in the spark.sql package solely
  * to satisfy the access modifier. */
object GraftBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
