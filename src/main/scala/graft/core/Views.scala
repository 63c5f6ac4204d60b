package graft.core

import org.apache.spark.sql.SparkSession

/** SQL-text entry point: register every fixture table as a temp view
  * so the reference's SQL users can run their queries via
  * `spark.sql(...)` directly (SURVEY §3.2 — view composition is the
  * reference's main analytics surface). Views are plan-level only:
  * scans stay lazy, pushdown/pruning apply as with the DataFrame API.
  */
object Views {

  val tableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Register all fixture tables of `dir` as temp views named after
    * the tables (lineitem, orders, …). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t => Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
}
