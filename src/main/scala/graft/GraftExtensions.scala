package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point: injects the engine's native
  * expressions into any session via config —
  * `spark.sql.extensions=graft.GraftExtensions` — so SQL-text users
  * (and Thrift/Connect clients on a real cluster) get `cosine_sim`
  * without touching code. Function-injection-only today; optimizer
  * rules/strategies are intentionally absent (SURVEY §4: built-in
  * Catalyst covers the reference's surface).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
  }
}
