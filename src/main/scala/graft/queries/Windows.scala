package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}

/** SURVEY.md §2.5 window-function operators.
  *
  * Scale notes: every window here partitions before ordering —
  * unpartitioned `Window.orderBy` pulls all rows into one task, so it
  * is only used over ALREADY-AGGREGATED frames (monthly series: ≤ a
  * few hundred rows regardless of input scale, e.g. w1). Windowed sums
  * over doubles go through decimal (see [[graft.core.Det]]) to stay
  * order-independent.
  */
object Windows {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** Monthly revenue series — shared base for the lag/rolling windows.
    * Aggregation happens BEFORE the window: the window input is ~84
    * rows (7 years × 12 months) no matter the fact-table scale. */
  private def monthly(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("ano"),
        month(col("o_orderdate")).as("mes"))
      .agg(dsum(col("o_totalprice")).as("total"))

  private val monthlySql: String =
    s"""(SELECT YEAR(o_orderdate) AS ano, MONTH(o_orderdate) AS mes,
        ${sqlDsum("o_totalprice")} AS total
        FROM orders GROUP BY 1, 2)"""

  /** W1: LAG MoM growth (`SMT_Reparos_MoM.sql:22-47`). */
  val w1LagMom: Q = (s, d) => {
    val w = Window.orderBy(col("ano"), col("mes"))
    monthly(s, d)
      .withColumn("total_anterior", lag(col("total"), 1).over(w))
      .withColumn("delta", col("total") - col("total_anterior"))
      .withColumn("pct",
        when(col("total_anterior").isNull || col("total_anterior") === 0, lit(null))
          .otherwise(col("delta") / col("total_anterior")))
      .orderBy(col("ano"), col("mes"))
  }

  /** W2: LAG partitioned — YoY same-month (`SMT_Reparos_YoY.sql:22-47`). */
  val w2LagYoy: Q = (s, d) => {
    val w = Window.partitionBy(col("mes")).orderBy(col("ano"))
    monthly(s, d)
      .withColumn("total_ano_anterior", lag(col("total"), 1).over(w))
      .withColumn("pct_yoy",
        when(col("total_ano_anterior").isNull || col("total_ano_anterior") === 0, lit(null))
          .otherwise((col("total") - col("total_ano_anterior")) / col("total_ano_anterior")))
      .orderBy(col("ano"), col("mes"))
  }

  /** W3: ROW_NUMBER top-1 per group (`View_SMT_AçõesDefinidas.sql:21,34`). */
  val w3Top1PerGroup: Q = (s, d) => {
    val counts = Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("n").desc, col("o_orderpriority"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderpriority").as("prioridade_top"), col("n"))
      .orderBy(col("o_custkey"))
  }

  /** W4: ROW_NUMBER top-N per group — top-3 clients per nation
    * (`Top 10 Faturamento Por Vendedora (6 meses).sql:6-23`). */
  val w4TopNPerGroup: Q = (s, d) => {
    val perClient = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(dsum(col("o_totalprice")).as("total"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("total").desc, col("c_custkey"))
    perClient.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy(col("c_nationkey"), col("rn"))
  }

  /** W5: windowed SUM as share denominator
    * (`View_SMT_AçõesDefinidas.sql:11`) — share of nation revenue. */
  val w5WindowShare: Q = (s, d) => {
    val perNation = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(dec2(col("o_totalprice"))).as("total_dec"))
    val w = Window.partitionBy(col("c_nationkey"))
    perNation
      .withColumn("total", col("total_dec").cast("double"))
      .withColumn("total_nacao", sum(col("total_dec")).over(w).cast("double"))
      .withColumn("participacao", col("total") / col("total_nacao"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("total"),
        col("total_nacao"), col("participacao"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** W6: dense_rank inside category
    * (`Base de Produtos Mais Vendidos - Showroom.py:123-125`). */
  val w6DenseRank: Q = (s, d) => {
    val w = Window.partitionBy(col("p_type"))
      .orderBy(col("p_retailprice").desc)
    Tables.part(s, d)
      .withColumn("rank_preco", dense_rank().over(w))
      .filter(col("rank_preco") <= 5)
      .select(col("p_type"), col("p_partkey"), col("p_retailprice"), col("rank_preco"))
      .orderBy(col("p_type"), col("rank_preco"), col("p_partkey"))
  }

  /** W7: cumcount 1..N position within group after sort
    * (`Base de Produtos Mais Vendidos.py:84-91`) — order sequence per
    * customer by date. */
  val w7Cumcount: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("seq_pedido", row_number().over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("seq_pedido"))
      .orderBy(col("o_custkey"), col("seq_pedido"))
  }

  /** W8: shift/lag % change on a daily series
    * (`Modelo de Previsão de Vendas.py:103-105`) over events. */
  val w8ShiftSeries: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("dia"))
      .agg(dsum(col("value")).as("valor"))
    val w = Window.orderBy(col("dia"))
    daily.withColumn("valor_anterior", lag(col("valor"), 1).over(w))
      .withColumn("pct",
        when(col("valor_anterior").isNull || col("valor_anterior") === 0, lit(null))
          .otherwise((col("valor") - col("valor_anterior")) / col("valor_anterior")))
      .orderBy(col("dia"))
  }

  /** W9: 3-month rolling mean (`Modelo de Previsão de Vendas.py:106`).
    * Decimal sum / count inside the frame keeps it order-independent. */
  val w9RollingMean: Q = (s, d) => {
    val w = Window.orderBy(col("ano"), col("mes")).rowsBetween(-2, 0)
    monthly(s, d)
      .withColumn("media_3m",
        sum(dec2(col("total"))).over(w).cast("double") / count(lit(1)).over(w))
      .orderBy(col("ano"), col("mes"))
  }

  /** W10: cumulative sum (`Modelo de Previsão de Vendas.py:108`). */
  val w10Cumsum: Q = (s, d) => {
    val w = Window.orderBy(col("ano"), col("mes"))
      .rowsBetween(Window.unboundedPreceding, 0)
    monthly(s, d)
      .withColumn("acumulado", sum(dec2(col("total"))).over(w).cast("double"))
      .orderBy(col("ano"), col("mes"))
  }

  /** W11: running business-day counter within year
    * (`Algoritmo de Estruturação de Dados.py:406-417`): over the
    * distinct order dates, cumulative count of weekdays. */
  val w11RunningBusinessDays: Q = (s, d) => {
    val dates = Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("dia")).distinct()
      .withColumn("ano", year(col("dia")))
      .withColumn("util", (weekday(col("dia")) < 5).cast("int"))
    val w = Window.partitionBy(col("ano")).orderBy(col("dia"))
      .rowsBetween(Window.unboundedPreceding, 0)
    dates.withColumn("dias_uteis_acum", sum(col("util")).over(w))
      .select(col("dia"), col("ano"), col("util"), col("dias_uteis_acum"))
      .orderBy(col("dia"))
  }

  /** W12: lag/rolling ML feature engineering per group
    * (`ETL - Análise Preditiva … Machine Learning.py:56,99`): per
    * nation monthly lag1 / mean3 / mean6. */
  val w12LagFeatures: Q = (s, d) => {
    val base = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey"),
        year(col("o_orderdate")).as("ano"), month(col("o_orderdate")).as("mes"))
      .agg(sum(dec2(col("o_totalprice"))).as("total_dec"))
    val ord = Window.partitionBy(col("c_nationkey")).orderBy(col("ano"), col("mes"))
    val w3m = ord.rowsBetween(-2, 0)
    val w6m = ord.rowsBetween(-5, 0)
    base
      .withColumn("total", col("total_dec").cast("double"))
      .withColumn("lag_1", lag(col("total_dec"), 1).over(ord).cast("double"))
      .withColumn("media_3m",
        sum(col("total_dec")).over(w3m).cast("double") / count(lit(1)).over(w3m))
      .withColumn("media_6m",
        sum(col("total_dec")).over(w6m).cast("double") / count(lit(1)).over(w6m))
      .select(col("c_nationkey"), col("ano"), col("mes"), col("total"),
        col("lag_1"), col("media_3m"), col("media_6m"))
      .orderBy(col("c_nationkey"), col("ano"), col("mes"))
  }

  /** W13: groupwise argmin (`Montador de PC.py:466-479`): cheapest part
    * per type. */
  val w13Argmin: Q = (s, d) => {
    val w = Window.partitionBy(col("p_type"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
    Tables.part(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_type"), col("p_partkey"), col("p_retailprice"))
      .orderBy(col("p_type"))
  }

  val defs: Map[String, Q] = Map(
    "w1_lag_mom" -> w1LagMom,
    "w2_lag_yoy" -> w2LagYoy,
    "w3_top1_per_group" -> w3Top1PerGroup,
    "w4_topn_per_group" -> w4TopNPerGroup,
    "w5_window_share" -> w5WindowShare,
    "w6_dense_rank" -> w6DenseRank,
    "w7_cumcount" -> w7Cumcount,
    "w8_shift_series" -> w8ShiftSeries,
    "w9_rolling_mean" -> w9RollingMean,
    "w10_cumsum" -> w10Cumsum,
    "w11_running_business_days" -> w11RunningBusinessDays,
    "w12_lag_features" -> w12LagFeatures,
    "w13_argmin" -> w13Argmin)

  val oracles: Map[String, String] = Map(
    "w1_lag_mom" -> s"""
      SELECT ano, mes, total,
        LAG(total, 1) OVER (ORDER BY ano, mes) AS total_anterior,
        total - LAG(total, 1) OVER (ORDER BY ano, mes) AS delta,
        CASE WHEN LAG(total, 1) OVER (ORDER BY ano, mes) IS NULL
               OR LAG(total, 1) OVER (ORDER BY ano, mes) = 0 THEN NULL
             ELSE (total - LAG(total, 1) OVER (ORDER BY ano, mes))
                  / LAG(total, 1) OVER (ORDER BY ano, mes) END AS pct
      FROM $monthlySql ORDER BY ano, mes""",
    "w2_lag_yoy" -> s"""
      SELECT ano, mes, total,
        LAG(total, 1) OVER (PARTITION BY mes ORDER BY ano) AS total_ano_anterior,
        CASE WHEN LAG(total, 1) OVER (PARTITION BY mes ORDER BY ano) IS NULL
               OR LAG(total, 1) OVER (PARTITION BY mes ORDER BY ano) = 0 THEN NULL
             ELSE (total - LAG(total, 1) OVER (PARTITION BY mes ORDER BY ano))
                  / LAG(total, 1) OVER (PARTITION BY mes ORDER BY ano) END AS pct_yoy
      FROM $monthlySql ORDER BY ano, mes""",
    "w3_top1_per_group" -> """
      SELECT o_custkey, o_orderpriority AS prioridade_top, n FROM (
        SELECT o_custkey, o_orderpriority, COUNT(*) AS n,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        FROM orders GROUP BY o_custkey, o_orderpriority)
      WHERE rn = 1 ORDER BY o_custkey""",
    "w4_topn_per_group" -> """
      SELECT c_nationkey, c_custkey, total, rn FROM (
        SELECT c_nationkey, c_custkey,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          ROW_NUMBER() OVER (PARTITION BY c_nationkey
            ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) DESC,
              c_custkey) AS rn
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_nationkey, c_custkey)
      WHERE rn <= 3 ORDER BY c_nationkey, rn""",
    "w5_window_share" -> """
      SELECT c_nationkey, c_mktsegment,
        CAST(total_dec AS DOUBLE) AS total,
        CAST(SUM(total_dec) OVER (PARTITION BY c_nationkey) AS DOUBLE) AS total_nacao,
        CAST(total_dec AS DOUBLE)
          / CAST(SUM(total_dec) OVER (PARTITION BY c_nationkey) AS DOUBLE)
          AS participacao
      FROM (SELECT c_nationkey, c_mktsegment,
              SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_nationkey, c_mktsegment)
      ORDER BY c_nationkey, c_mktsegment""",
    "w6_dense_rank" -> """
      SELECT p_type, p_partkey, p_retailprice, rank_preco FROM (
        SELECT p_type, p_partkey, p_retailprice,
          DENSE_RANK() OVER (PARTITION BY p_type ORDER BY p_retailprice DESC)
            AS rank_preco
        FROM part)
      WHERE rank_preco <= 5
      ORDER BY p_type, rank_preco, p_partkey""",
    "w7_cumcount" -> """
      SELECT o_custkey, o_orderkey,
        ROW_NUMBER() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) AS seq_pedido
      FROM orders ORDER BY o_custkey, seq_pedido""",
    "w8_shift_series" -> s"""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS dia, ${sqlDsum("value")} AS valor
        FROM events GROUP BY 1)
      SELECT dia, valor,
        LAG(valor, 1) OVER (ORDER BY dia) AS valor_anterior,
        CASE WHEN LAG(valor, 1) OVER (ORDER BY dia) IS NULL
               OR LAG(valor, 1) OVER (ORDER BY dia) = 0 THEN NULL
             ELSE (valor - LAG(valor, 1) OVER (ORDER BY dia))
                  / LAG(valor, 1) OVER (ORDER BY dia) END AS pct
      FROM daily ORDER BY dia""",
    "w9_rolling_mean" -> s"""
      SELECT ano, mes, total,
        CAST(SUM(CAST(total AS DECIMAL(18,2))) OVER w AS DOUBLE)
          / COUNT(*) OVER w AS media_3m
      FROM $monthlySql
      WINDOW w AS (ORDER BY ano, mes ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY ano, mes""",
    "w10_cumsum" -> s"""
      SELECT ano, mes, total,
        CAST(SUM(CAST(total AS DECIMAL(18,2))) OVER
          (ORDER BY ano, mes ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS DOUBLE) AS acumulado
      FROM $monthlySql ORDER BY ano, mes""",
    "w11_running_business_days" -> """
      SELECT dia, ano, util,
        CAST(SUM(util) OVER (PARTITION BY ano ORDER BY dia
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS dias_uteis_acum
      FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS dia,
              YEAR(o_orderdate) AS ano,
              CAST(ISODOW(o_orderdate) <= 5 AS INT) AS util
            FROM orders)
      ORDER BY dia""",
    "w12_lag_features" -> """
      SELECT c_nationkey, ano, mes,
        CAST(total_dec AS DOUBLE) AS total,
        CAST(LAG(total_dec, 1) OVER ord AS DOUBLE) AS lag_1,
        CAST(SUM(total_dec) OVER w3 AS DOUBLE) / COUNT(*) OVER w3 AS media_3m,
        CAST(SUM(total_dec) OVER w6 AS DOUBLE) / COUNT(*) OVER w6 AS media_6m
      FROM (SELECT c_nationkey, YEAR(o_orderdate) AS ano, MONTH(o_orderdate) AS mes,
              SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY 1, 2, 3)
      WINDOW ord AS (PARTITION BY c_nationkey ORDER BY ano, mes),
        w3 AS (PARTITION BY c_nationkey ORDER BY ano, mes
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        w6 AS (PARTITION BY c_nationkey ORDER BY ano, mes
          ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
      ORDER BY c_nationkey, ano, mes""",
    "w13_argmin" -> """
      SELECT p_type, p_partkey, p_retailprice FROM (
        SELECT p_type, p_partkey, p_retailprice,
          ROW_NUMBER() OVER (PARTITION BY p_type
            ORDER BY p_retailprice, p_partkey) AS rn
        FROM part)
      WHERE rn = 1 ORDER BY p_type""")
}
