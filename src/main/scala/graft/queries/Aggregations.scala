package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}

/** SURVEY.md §2.4 aggregation operators, one named query each.
  * Every query has a DuckDB oracle (see `oracles`); all money math
  * uses [[graft.core.Det]] exact-decimal arithmetic so hashes match.
  */
object Aggregations {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** A1 flagship: pricing summary (group sum/avg/count à la the
    * per-seller KPI aggregations, `EDA - Faturamento.py:101`,
    * `SLA de Produção - Completo.sql:87-104`). */
  val q1Agg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${sqlDsum("l_quantity")} AS sum_qty,
      ${sqlDsum("l_extendedprice")} AS sum_base_price,
      CAST(SUM(${sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
      ${sqlDavg("l_quantity")} AS avg_qty,
      ${sqlDavg("l_extendedprice")} AS avg_price,
      COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  val defs: Map[String, Q] = Map(
    "q1_agg" -> q1Agg)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql)
}
