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

  /** Wrap a 1-row/1-column DataFrame as a scalar-subquery expression —
    * the lazy alternative to collecting a scalar and embedding it as a
    * literal. This is the exact shape Spark's own InjectRuntimeFilter
    * uses to feed `BloomFilterMightContain` (whose type check admits a
    * foldable literal or a PlanExpression subquery): the aggregate
    * runs as a subquery stage of the ONE enclosing query, not as a
    * separate eager job at plan-construction time. */
  def scalarSubquery(df: DataFrame): Column =
    toColumn(org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      df.queryExecution.analyzed))

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
