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

  /** Register the tables PRESENT in `dir` as temp views named after
    * the tables (lineitem, orders, …). Absent tables are skipped —
    * a partial warehouse registers its subset instead of failing
    * half-initialized on the first missing path. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    tableNames
      .filter(t => java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, s"$t.parquet")))
      .foreach {
        case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
        case t => Tables.table(spark, dir, t).createOrReplaceTempView(t)
      }
}
