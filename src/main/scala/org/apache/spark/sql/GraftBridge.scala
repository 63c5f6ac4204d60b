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

  /** Build a DataFrame from a custom logical plan (Dataset.ofRows is
    * `private[sql]` in 4.x). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently register a planner strategy on a session that was
    * not started with `spark.sql.extensions=graft.GraftExtensions`
    * (the config path also registers it). */
  def ensureStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
