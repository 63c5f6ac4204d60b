package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}
import graft.functions.BrFunctions.{formatBrl, weekdaysPt}

/** Shape-exact ports of the showroom / multimarcas report procedures
  * (under `scripts_sql` and `Códigos Úteis SQL`) not already in
  * [[Reports]].
  *
  * The Spark-first highlight is r17: the reference emulates FULL OUTER
  * JOIN with the classic MySQL idiom — two mirrored LEFT JOINs glued
  * by a deduplicating UNION (`Showroom_Comparativo_V2.sql:33-55`).
  * Spark has the operator natively, so the port declares one
  * `full_outer` join and Catalyst plans a single shuffle join instead
  * of two joins + a distinct.
  *
  * Money/percent display conventions follow [[Reports]]/[[ReportsSmt]]:
  * exact integer cents → half-up (away from zero) → grouped de_DE
  * string, so Spark and the DuckDB oracle agree bit-for-bit.
  */
object ReportsShowroom {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** The showroom event calendar (`Showroom_Comparativo_V2.sql:9-16`)
    * mapped into the data's date range, "negotiation-extended" windows
    * included. */
  private val eventos = Seq(
    ("INVERNO 1997", "1997-01-20", "1997-01-24"),
    ("VERÃO 1998", "1997-06-16", "1997-06-20"),
    ("INVERNO 1998", "1998-02-03", "1998-02-27"),
    ("VERÃO 1999", "1998-06-29", "1998-07-03"),
    ("INVERNO 1999", "1999-01-25", "1999-02-14"))

  /** signed exact centi-percent of (b-a)/a*100, half-up away from zero;
    * NULL when a = 0 (upstream guards decide the display). */
  private def crescCp(a: String, b: String): Column =
    expr(s"""CASE WHEN $a = 0 THEN NULL
      ELSE CAST(SIGN($b - $a) AS BIGINT)
        * ((ABS($b - $a) * 20000 + $a) div (2 * $a)) END""")

  private def crescCpSql(a: String, b: String): String =
    s"""CASE WHEN $a = 0 THEN NULL
      ELSE CAST(SIGN($b - $a) AS BIGINT)
        * ((ABS($b - $a) * 20000 + $a) // (2 * $a)) END"""

  /** de_DE 2-decimal percent string from a centi-percent column. */
  private def pctDeStr(cp: Column): Column =
    concat(when(cp < 0, "-").otherwise(""),
      translate(format_number((abs(cp) / 100).cast("long"), 0), ",", "."),
      lit(","), lpad((abs(cp) % 100).cast("string"), 2, "0"), lit("%"))

  private def pctDeSql(cp: String): String =
    s"""(CASE WHEN $cp < 0 THEN '-' ELSE '' END)
      || translate(format('{:,}', ABS($cp) // 100), ',', '.')
      || ',' || lpad(CAST(ABS($cp) % 100 AS VARCHAR), 2, '0') || '%'"""

  /** R17: `Showroom_Comparativo_V2(evento_A, evento_B)` shape-exact
    * (`scripts_sql/Showroom_Comparativo_V2.sql`): CASE event-window
    * bucketing over the sales timestamp, daily totals per event,
    * day-ordinal alignment (ROW_NUMBER per event by date), FULL OUTER
    * on the ordinal — declared natively instead of the reference's
    * UNION-of-two-LEFT-JOINs emulation — then ROLLUP for the
    * 'Total Geral' row, dd/MM/yy date display ('S/ Data' for the
    * unmatched side, '-' on the total row), de_DE money strings and
    * the growth-vs-event-A percent (`'0%'` when A sums to zero, the
    * IFNULL(…,0) branch). Params: A='INVERNO 1998', B='INVERNO 1999'
    * (the two negotiation-extended windows — unequal day counts, so
    * the outer join's dangling rows are exercised). Aliases:
    * 'Dia'→dia, event-named money columns→evento_a/evento_b,
    * 'Cresc_Dia'→cresc_dia. */
  val r17ShowroomComparativo: Q = (s, d) => {
    val (evA, evB) = ("INVERNO 1998", "INVERNO 1999")
    val evento = eventos.foldRight(lit(null).cast("string")) {
      case ((n, a, b), acc) =>
        when(to_date(col("o_orderdate")).between(a, b), n).otherwise(acc)
    }
    val vendasBase = Tables.orders(s, d)
      .withColumn("nome_evento", evento)
      .groupBy(col("nome_evento"), to_date(col("o_orderdate")).as("data_venda"))
      .agg(sum(coalesce(dec2(col("o_totalprice")), lit(0).cast("decimal(18,2)")))
        .as("total_dia"))
      .filter(col("nome_evento").isNotNull)
      .withColumn("ordem_dia", row_number().over(
        Window.partitionBy(col("nome_evento")).orderBy(col("data_venda"))))
    def side(ev: String, suffix: String) = vendasBase
      .filter(col("nome_evento") === ev)
      .select(col("ordem_dia"), col("data_venda").as(s"data_$suffix"),
        col("total_dia").as(s"valor_$suffix"))
    // the reference's UNION-of-mirrored-LEFT-JOINs, as the operator it
    // spells: one FULL OUTER JOIN
    val comparativo = side(evA, "a").join(side(evB, "b"),
      Seq("ordem_dia"), "full_outer")
    comparativo.rollup(col("ordem_dia"))
      .agg(grouping(col("ordem_dia")).cast("int").as("g"),
        max(col("data_a")).as("da"), max(col("data_b")).as("db"),
        sum(coalesce(col("valor_a"), lit(0).cast("decimal(18,2)"))).as("sa"),
        sum(coalesce(col("valor_b"), lit(0).cast("decimal(18,2)"))).as("sb"))
      .withColumn("ca", (col("sa") * 100).cast("long"))
      .withColumn("cb", (col("sb") * 100).cast("long"))
      .select(
        when(col("g") === 1, "Total Geral")
          .otherwise(col("ordem_dia").cast("string")).as("dia"),
        when(col("g") === 1, "-")
          .otherwise(coalesce(date_format(col("da"), "dd/MM/yy"), lit("S/ Data")))
          .as("data_a"),
        formatBrl(col("sa")).as("evento_a"),
        when(col("g") === 1, "-")
          .otherwise(coalesce(date_format(col("db"), "dd/MM/yy"), lit("S/ Data")))
          .as("data_b"),
        formatBrl(col("sb")).as("evento_b"),
        when(col("ca") === 0, "0%")
          .otherwise(concat((crescCp("ca", "cb") / 100.0).cast("string"),
            lit("%"))).as("cresc_dia"),
        col("g"), col("ordem_dia"))
      .orderBy(col("g"), col("ordem_dia"))
      .drop("ordem_dia")
  }

  /** R18: `Devolucao_%(p_mes, p_ano)` shape-exact
    * (`scripts_sql/Devolucao_%.sql`): per-motivo returned value +
    * count, '% Repres.' as a de_DE FORMAT'd share of total items,
    * hidden numeric ordering columns dropped by the outer SELECT, and
    * the UNION ALL 'TOTAL GERAL' row carrying the literal '100,00%'.
    * Analog: motivo = o_orderpriority, returns = orders of 1997-03.
    * Aliases: 'Valor(R$) devolvido'→valor_devolvido,
    * '% Repres.'→pct_repres. */
  val r18DevolucaoPct: Q = (s, d) => {
    val base = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1997 &&
        month(col("o_orderdate")) === 3)
      .groupBy(col("o_orderpriority").as("motivo"))
      .agg(sum(dec2(col("o_totalprice"))).as("valor_num"),
        count(lit(1)).as("qtde"))
    val totals = base.agg(sum(col("valor_num")).as("soma_total"),
      sum(col("qtde")).as("itens_total"))
    val detail = base.crossJoin(broadcast(totals))
      .withColumn("cp",
        expr("(qtde * 10000 * 2 + itens_total) div (2 * itens_total)"))
      .select(
        coalesce(col("motivo"), lit("Não Informado")).as("motivo"),
        formatBrl(col("valor_num")).as("valor_devolvido"),
        col("qtde"),
        pctDeStr(col("cp")).as("pct_repres"),
        lit(0).as("ordem"), col("valor_num").as("ord_valor"))
    val total = totals.select(
      lit("TOTAL GERAL").as("motivo"),
      formatBrl(col("soma_total")).as("valor_devolvido"),
      col("itens_total").as("qtde"),
      lit("100,00%").as("pct_repres"),
      lit(1).as("ordem"), col("soma_total").as("ord_valor"))
    detail.unionByName(total)
      .orderBy(col("ordem"), col("ord_valor").desc, col("qtde").desc)
      .drop("ordem", "ord_valor")
  }

  /** R19: `Cálculo Vendido por Semana.sql` shape-exact: daily totals
    * over a literal date window with the pt-BR weekday-name ladder
    * (F-family scalar [[graft.functions.BrFunctions.diaSemanaPt]])
    * and a de_DE money string, ordered by sale date. Window mapped to
    * 1997-07-25..31. */
  val r19VendidoSemana: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-07-25 00:00:00").cast("timestamp") &&
        col("o_orderdate") <= lit("1997-07-31 23:59:59").cast("timestamp"))
      .groupBy(to_date(col("o_orderdate")).as("data_venda"),
        graft.functions.BrFunctions.diaSemanaPt(col("o_orderdate"))
          .as("dia_semana"))
      .agg(formatBrl(coalesce(sum(dec2(col("o_totalprice"))),
        lit(0).cast("decimal(18,2)"))).as("total_faturado"))
      .orderBy(col("data_venda"))

  val defs: Map[String, Q] = Map(
    "r17_showroom_comparativo" -> r17ShowroomComparativo,
    "r18_devolucao_pct" -> r18DevolucaoPct,
    "r19_vendido_semana" -> r19VendidoSemana)

  private val eventoCaseSql: String = eventos
    .map { case (n, a, b) =>
      s"WHEN CAST(o_orderdate AS DATE) BETWEEN '$a' AND '$b' THEN '$n'" }
    .mkString("CASE ", " ", " END")

  private val brlDeSql: String => String = e =>
    s"""'R$$ ' || translate(format('{:,}', CAST(FLOOR(CAST($e AS DECIMAL(18,2))) AS BIGINT)), ',', '.')
       || ',' || lpad(CAST(CAST((CAST($e AS DECIMAL(18,2)) - FLOOR(CAST($e AS DECIMAL(18,2)))) * 100 AS BIGINT) AS VARCHAR), 2, '0')"""

  private val weekdayCaseSql: String = weekdaysPt.zipWithIndex
    .map { case (w, i) => s"WHEN ${i + 1} THEN '$w'" }
    .mkString(
      "CASE (CAST(strftime(o_orderdate, '%w') AS INT) + 1) ",
      " ", " ELSE 'Data Desconhecida' END")

  val oracles: Map[String, String] = Map(
    "r17_showroom_comparativo" -> s"""
      WITH vendas_base AS (
        SELECT $eventoCaseSql AS nome_evento,
          CAST(o_orderdate AS DATE) AS data_venda,
          SUM(COALESCE(CAST(o_totalprice AS DECIMAL(18,2)),
            CAST(0 AS DECIMAL(18,2)))) AS total_dia
        FROM orders GROUP BY 1, 2),
      ordenadas AS (
        SELECT nome_evento, data_venda, total_dia,
          ROW_NUMBER() OVER (PARTITION BY nome_evento ORDER BY data_venda)
            AS ordem_dia
        FROM vendas_base WHERE nome_evento IS NOT NULL),
      comparativo AS (
        SELECT COALESCE(a.ordem_dia, b.ordem_dia) AS ordem_dia,
          a.data_venda AS data_a, a.total_dia AS valor_a,
          b.data_venda AS data_b, b.total_dia AS valor_b
        FROM (SELECT * FROM ordenadas WHERE nome_evento = 'INVERNO 1998') a
        FULL OUTER JOIN
          (SELECT * FROM ordenadas WHERE nome_evento = 'INVERNO 1999') b
        ON a.ordem_dia = b.ordem_dia),
      rolled AS (
        SELECT CAST(GROUPING(ordem_dia) AS INT) AS g, ordem_dia,
          MAX(data_a) AS da, MAX(data_b) AS db,
          SUM(COALESCE(valor_a, CAST(0 AS DECIMAL(18,2)))) AS sa,
          SUM(COALESCE(valor_b, CAST(0 AS DECIMAL(18,2)))) AS sb
        FROM comparativo GROUP BY ROLLUP (ordem_dia)),
      cents AS (
        SELECT *, CAST(sa * 100 AS BIGINT) AS ca, CAST(sb * 100 AS BIGINT) AS cb
        FROM rolled)
      SELECT
        CASE WHEN g = 1 THEN 'Total Geral'
          ELSE CAST(ordem_dia AS VARCHAR) END AS dia,
        CASE WHEN g = 1 THEN '-'
          ELSE COALESCE(strftime(da, '%d/%m/%y'), 'S/ Data') END AS data_a,
        ${brlDeSql("sa")} AS evento_a,
        CASE WHEN g = 1 THEN '-'
          ELSE COALESCE(strftime(db, '%d/%m/%y'), 'S/ Data') END AS data_b,
        ${brlDeSql("sb")} AS evento_b,
        CASE WHEN ca = 0 THEN '0%'
          ELSE CAST((${crescCpSql("ca", "cb")}) / 100.0 AS VARCHAR) || '%'
        END AS cresc_dia,
        g
      FROM cents ORDER BY g, ordem_dia""",
    "r18_devolucao_pct" -> s"""
      WITH base AS (
        SELECT o_orderpriority AS motivo,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS valor_num,
          COUNT(*) AS qtde
        FROM orders
        WHERE YEAR(o_orderdate) = 1997 AND MONTH(o_orderdate) = 3
        GROUP BY 1),
      totals AS (
        SELECT SUM(valor_num) AS soma_total,
          CAST(SUM(qtde) AS BIGINT) AS itens_total
        FROM base)
      SELECT COALESCE(motivo, 'Não Informado') AS motivo,
        ${brlDeSql("valor_num")} AS valor_devolvido, qtde,
        ${pctDeSql(
          "((qtde * 10000 * 2 + itens_total) // (2 * itens_total))")}
          AS pct_repres
      FROM base CROSS JOIN totals
      UNION ALL
      SELECT 'TOTAL GERAL', ${brlDeSql("soma_total")}, itens_total, '100,00%'
      FROM totals""",
    "r19_vendido_semana" -> s"""
      SELECT CAST(o_orderdate AS DATE) AS data_venda,
        $weekdayCaseSql AS dia_semana,
        ${brlDeSql(
          """COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))),
             CAST(0 AS DECIMAL(18,2)))""")} AS total_faturado
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-07-25 00:00:00'
        AND o_orderdate <= TIMESTAMP '1997-07-31 23:59:59'
      GROUP BY 1, 2 ORDER BY 1""")
}
