package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}
import graft.functions.BrFunctions._

/** Ports of the reference's flagship report procedures/views — the
  * queries a user of the reference actually runs (SURVEY §3.2, §7.2).
  * Each is a parameterized Scala function returning a DataFrame (the
  * stored-procedure analog); r3 additionally goes through Spark SQL
  * text over temp views to exercise the reference's multi-level view
  * composition verbatim.
  */
object Reports {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** R1: seller performance rollup — port of `CALL Cenario_Faturamento`
    * (`Códigos Úteis SQL/CALL Cenario_Faturamento.sql:31-103`):
    * per-segment revenue/clients/orders vs meta, gap + atingimento %,
    * BRL display twin, grand-total row with summed meta, total last
    * (A9+A12+F14+F26+O4+J5 in one report). */
  val r1CenarioFaturamento: Q = (s, d) => {
    import s.implicits._
    val metas = Seq(
      ("AUTOMOBILE", 900000000.0), ("BUILDING", 900000000.0),
      ("FURNITURE", 850000000.0), ("HOUSEHOLD", 880000000.0),
      ("MACHINERY", 920000000.0)).toDF("segmento", "meta")
    val detail = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment").as("segmento"))
      .agg(dsum(col("o_totalprice")).as("faturamento"),
        countDistinct(col("c_custkey")).as("clientes"),
        count(lit(1)).as("pedidos"))
      .join(broadcast(metas), Seq("segmento"), "left")
      .withColumn("linha_total", lit(0))
    val total = detail.agg(
      sum(dec2(col("faturamento"))).cast("double").as("faturamento"),
      sum(col("clientes")).as("clientes"),
      sum(col("pedidos")).as("pedidos"),
      sum(dec2(col("meta"))).cast("double").as("meta"))
      .select(lit("--- TOTAL ---").as("segmento"), col("faturamento"),
        col("clientes"), col("pedidos"), col("meta"), lit(1).as("linha_total"))
    detail.unionByName(total)
      .withColumn("gap", round(dec2(col("faturamento")) - dec2(col("meta")), 2).cast("double"))
      .withColumn("atingimento_pct",
        when(col("meta").isNull || col("meta") === 0, lit(null))
          .otherwise(round(col("faturamento") / col("meta") * 100, 2)))
      .withColumn("faturamento_fmt", formatBrl(col("faturamento")))
      .select(col("segmento"), col("faturamento"), col("faturamento_fmt"),
        col("clientes"), col("pedidos"), col("meta"), col("gap"),
        col("atingimento_pct"), col("linha_total"))
      .orderBy(col("linha_total"), col("segmento"))
  }

  /** R2: recurrence base — port of `vw_recorrencia_base`
    * (`ScriptsSQL - Constance/vw_recorrencia_base.sql:1-45`):
    * days-without-purchase bands (vs injected clock), client counts,
    * % of base, UNION ALL total row sorted last (P12+A9+A10+O4). */
  val r2RecorrenciaBase: Q = (s, d) => {
    val lastOrder = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("ultimo"))
    val banded = Tables.customer(s, d)
      .join(lastOrder, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("dias", datediff(lit("2002-01-01").cast("date"), to_date(col("ultimo"))))
      .withColumn("faixa",
        when(col("dias").isNull, "NUNCA COMPROU")
          .when(col("dias") <= 180, "ATIVO (0-180)")
          .when(col("dias") <= 365, "MORNO (181-365)")
          .otherwise("INATIVO (>365)"))
    val base = banded.groupBy(col("faixa")).agg(count(lit(1)).as("clientes"))
      .withColumn("linha_total", lit(0))
    val total = banded.agg(count(lit(1)).as("clientes"))
      .select(lit("--- TOTAL ---").as("faixa"), col("clientes"), lit(1).as("linha_total"))
    // grand total as broadcast scalar (no driver-side action)
    val grand = banded.agg(count(lit(1)).as("base_total"))
    base.unionByName(total)
      .crossJoin(broadcast(grand))
      .withColumn("pct",
        round(col("clientes").cast("double") / col("base_total") * 100, 2))
      .select(col("faixa"), col("clientes"), col("linha_total"), col("pct"))
      .orderBy(col("linha_total"), col("faixa"))
  }

  /** R3: multi-level view composition through Spark SQL text — the
    * alertas view consuming the base view (`vw_recorrencia_alertas.sql`
    * over `vw_recorrencia_base`, SURVEY §3.2): registered temp views +
    * `spark.sql`, exactly the reference's CREATE VIEW chain. */
  val r3RecorrenciaAlertas: Q = (s, d) => {
    r2RecorrenciaBase(s, d).createOrReplaceTempView("vw_recorrencia_base")
    s.sql("""
      SELECT faixa, clientes, pct,
        CASE WHEN faixa = 'INATIVO (>365)' AND pct > 20 THEN 'CRITICO'
             WHEN faixa IN ('MORNO (181-365)', 'INATIVO (>365)') THEN 'ALERTA'
             ELSE 'OK' END AS alerta
      FROM vw_recorrencia_base
      WHERE linha_total = 0
      ORDER BY faixa""")
  }

  /** R4: delinquency base with display/numeric duality — port of
    * `vw_Inadimplencia_Base.sql:30-54`: per-priority open amounts,
    * BRL display string + hidden numeric twin for ordering (F14,
    * SURVEY §7.4 risk 2), total row last by flag. */
  val r4InadimplenciaBase: Q = (s, d) => {
    val open = Tables.orders(s, d).filter(col("o_orderstatus") =!= "F")
    val detail = open.groupBy(col("o_orderpriority").as("prioridade"))
      .agg(dsum(col("o_totalprice")).as("valor_num"), count(lit(1)).as("titulos"))
      .withColumn("linha_total", lit(0))
    val total = open.agg(dsum(col("o_totalprice")).as("valor_num"),
      count(lit(1)).as("titulos"))
      .select(lit("--- TOTAL ---").as("prioridade"), col("valor_num"),
        col("titulos"), lit(1).as("linha_total"))
    detail.unionByName(total)
      .withColumn("valor_fmt", formatBrl(col("valor_num")))
      .select(col("prioridade"), col("valor_fmt"), col("valor_num"),
        col("titulos"), col("linha_total"))
      .orderBy(col("linha_total"), col("valor_num").desc)
  }

  val defs: Map[String, Q] = Map(
    "r1_cenario_faturamento" -> r1CenarioFaturamento,
    "r2_recorrencia_base" -> r2RecorrenciaBase,
    "r3_recorrencia_alertas" -> r3RecorrenciaAlertas,
    "r4_inadimplencia_base" -> r4InadimplenciaBase)

  private val brlFmtSql: String => String = expr =>
    s"""'R$$ ' || translate(format('{:,}', CAST(FLOOR(CAST($expr AS DECIMAL(18,2))) AS BIGINT)), ',', '.')
       || ',' || lpad(CAST(CAST((CAST($expr AS DECIMAL(18,2)) - FLOOR(CAST($expr AS DECIMAL(18,2)))) * 100 AS BIGINT) AS VARCHAR), 2, '0')"""

  private val r2BaseSql = s"""
      WITH banded AS (
        SELECT c_custkey,
          CASE WHEN dias IS NULL THEN 'NUNCA COMPROU'
               WHEN dias <= 180 THEN 'ATIVO (0-180)'
               WHEN dias <= 365 THEN 'MORNO (181-365)'
               ELSE 'INATIVO (>365)' END AS faixa
        FROM (SELECT c_custkey,
                date_diff('day', CAST(ultimo AS DATE), DATE '2002-01-01') AS dias
              FROM customer
              LEFT JOIN (SELECT o_custkey, MAX(o_orderdate) AS ultimo
                         FROM orders GROUP BY o_custkey) o
                ON c_custkey = o_custkey)),
      base AS (
        SELECT faixa, COUNT(*) AS clientes, 0 AS linha_total
        FROM banded GROUP BY faixa
        UNION ALL
        SELECT '--- TOTAL ---', COUNT(*), 1 FROM banded)
      SELECT faixa, clientes, linha_total,
        ROUND(CAST(clientes AS DOUBLE)
          / (SELECT CAST(COUNT(*) AS DOUBLE) FROM banded) * 100, 2) AS pct
      FROM base"""

  val oracles: Map[String, String] = Map(
    "r1_cenario_faturamento" -> s"""
      WITH metas AS (SELECT * FROM (VALUES
        ('AUTOMOBILE', 900000000.0), ('BUILDING', 900000000.0),
        ('FURNITURE', 850000000.0), ('HOUSEHOLD', 880000000.0),
        ('MACHINERY', 920000000.0)) AS m(segmento, meta)),
      detail AS (
        SELECT c_mktsegment AS segmento,
          ${sqlDsum("o_totalprice")} AS faturamento,
          COUNT(DISTINCT c_custkey) AS clientes,
          COUNT(*) AS pedidos
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment),
      joined AS (
        SELECT d.segmento, d.faturamento, d.clientes, d.pedidos, m.meta,
          0 AS linha_total
        FROM detail d LEFT JOIN metas m ON d.segmento = m.segmento),
      com_total AS (
        SELECT * FROM joined
        UNION ALL
        SELECT '--- TOTAL ---',
          CAST(SUM(CAST(faturamento AS DECIMAL(18,2))) AS DOUBLE),
          SUM(clientes), SUM(pedidos),
          CAST(SUM(CAST(meta AS DECIMAL(18,2))) AS DOUBLE), 1
        FROM joined)
      SELECT segmento, faturamento,
        ${brlFmtSql("faturamento")} AS faturamento_fmt,
        clientes, pedidos, meta,
        CAST(ROUND(CAST(faturamento AS DECIMAL(18,2))
          - CAST(meta AS DECIMAL(18,2)), 2) AS DOUBLE) AS gap,
        CASE WHEN meta IS NULL OR meta = 0 THEN NULL
             ELSE ROUND(faturamento / meta * 100, 2) END AS atingimento_pct,
        linha_total
      FROM com_total
      ORDER BY linha_total, segmento""",
    "r2_recorrencia_base" -> s"""
      SELECT faixa, clientes, linha_total, pct FROM ($r2BaseSql)
      ORDER BY linha_total, faixa""",
    "r3_recorrencia_alertas" -> s"""
      SELECT faixa, clientes, pct,
        CASE WHEN faixa = 'INATIVO (>365)' AND pct > 20 THEN 'CRITICO'
             WHEN faixa IN ('MORNO (181-365)', 'INATIVO (>365)') THEN 'ALERTA'
             ELSE 'OK' END AS alerta
      FROM ($r2BaseSql)
      WHERE linha_total = 0
      ORDER BY faixa""",
    "r4_inadimplencia_base" -> s"""
      WITH abertos AS (SELECT * FROM orders WHERE o_orderstatus <> 'F'),
      detail AS (
        SELECT o_orderpriority AS prioridade,
          ${sqlDsum("o_totalprice")} AS valor_num,
          COUNT(*) AS titulos, 0 AS linha_total
        FROM abertos GROUP BY o_orderpriority
        UNION ALL
        SELECT '--- TOTAL ---', ${sqlDsum("o_totalprice")}, COUNT(*), 1
        FROM abertos)
      SELECT prioridade, ${brlFmtSql("valor_num")} AS valor_fmt,
        valor_num, titulos, linha_total
      FROM detail
      ORDER BY linha_total, valor_num DESC""")
}
