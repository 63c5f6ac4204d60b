package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.BrFunctions.{monthNamePt, monthsPt}

/** Shape-exact ports of the SMT repair-analytics report family
  * (`ScriptsSQL - Belmicro/SMT_*.sql`, `View_SMT_*.sql`,
  * `SP_SMT_*.sql`) — the procedure/view call chains a reference user
  * runs as whole reports, beyond the per-operator queries already in
  * [[Windows]]/[[Aggregations]].
  *
  * The reference's `staging_reparos` table is modeled once, here, as a
  * lineitem⋈part scan (see [[reparos]]); every report in the family
  * derives from that shared analog, so the ports keep the reference's
  * own view-over-staging layering.
  *
  * Display-parity conventions (carried over from [[Reports]]):
  *  - percents/means that MySQL computes as `ROUND(double, n)` are
  *    computed from exact integer arithmetic (half-up, away from zero)
  *    so Spark and the DuckDB oracle agree bit-for-bit — a double
  *    rounded near a boundary formats differently across engines;
  *  - `FORMAT(x, 2)`-style grouped display strings are rebuilt from the
  *    integer "centi-percent" parts (`format_number`/`format('{:,}')`);
  *  - reference column names with spaces/accents (`'Qtd Atual'`,
  *    `'AÇÕES'`) become snake/upper ASCII aliases — parquet field-name
  *    restrictions — with the mapping noted per query;
  *  - `ORDER BY` clauses gain a unique tiebreak so `LIMIT`ed results
  *    are deterministic in both engines (the reference relies on
  *    storage order for ties).
  *
  * Scale notes: every report aggregates BEFORE windowing/display, so
  * window inputs are dimension-sized (months × years × short dims), not
  * fact-sized. The only fact-scale shuffles are the groupBys on the
  * staging analog, which partial-aggregate map-side; the part-side
  * lookup join is broadcast-able (dimension table).
  */
object ReportsSmt {

  type Q = (SparkSession, String) => DataFrame

  /** `staging_reparos` analog: one repair record per lineitem.
    * chave_ano/chave_mes (pt-BR month name) from l_shipdate, origem
    * from l_returnflag (A→ASSISTÊNCIA, R→PRODUÇÃO, N→SMT), técnico =
    * supplier, ação = p_type, fornecedor = p_brand, num_serie = the
    * physical unit (part+supplier), sku = part key. */
  private def reparos(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .select(
        year(col("l_shipdate")).as("chave_ano"),
        monthNamePt(month(col("l_shipdate"))).as("chave_mes"),
        month(col("l_shipdate")).as("mes_n"),
        when(col("l_returnflag") === "A", "ASSISTÊNCIA")
          .when(col("l_returnflag") === "R", "PRODUÇÃO")
          .otherwise("SMT").as("origem"),
        concat(lit("TEC-"), col("l_suppkey")).as("tecnico"),
        col("p_type").as("acao_realizada"),
        col("p_brand").as("fornecedor"),
        concat(lit("SN-"), col("l_partkey"), lit("-"), col("l_suppkey"))
          .as("num_serie"),
        col("l_partkey").as("sku"),
        col("l_suppkey").as("linha_sku"),
        col("p_name").as("produto_desc"),
        when(col("l_linestatus") === "F", "SCRAP").otherwise("REPARADO")
          .as("situacao"),
        to_date(col("l_shipdate")).as("data_reparo"))

  private val monthCaseSql: String = monthsPt.zipWithIndex
    .map { case (m, i) => s"WHEN ${i + 1} THEN '$m'" }
    .mkString("CASE MONTH(l_shipdate) ", " ", " END")

  private val reparosSql: String = s"""
    (SELECT YEAR(l_shipdate) AS chave_ano,
       $monthCaseSql AS chave_mes,
       MONTH(l_shipdate) AS mes_n,
       CASE l_returnflag WHEN 'A' THEN 'ASSISTÊNCIA'
         WHEN 'R' THEN 'PRODUÇÃO' ELSE 'SMT' END AS origem,
       'TEC-' || CAST(l_suppkey AS VARCHAR) AS tecnico,
       p_type AS acao_realizada,
       p_brand AS fornecedor,
       'SN-' || CAST(l_partkey AS VARCHAR) || '-'
         || CAST(l_suppkey AS VARCHAR) AS num_serie,
       l_partkey AS sku,
       l_suppkey AS linha_sku,
       p_name AS produto_desc,
       CASE WHEN l_linestatus = 'F' THEN 'SCRAP' ELSE 'REPARADO' END
         AS situacao,
       CAST(l_shipdate AS DATE) AS data_reparo
     FROM lineitem JOIN part ON l_partkey = p_partkey)"""

  /** The procedures' `p_ano` parameter: a full year inside the
    * l_shipdate range (1995-2001), with a prior year present so MoM
    * crosses the boundary and YoY finds its lag. */
  private val pAno = 1997

  // ---------------------------------------------------------------
  // MoM / YoY growth reports
  // ---------------------------------------------------------------

  /** `FORMAT(growth*100, 2) + '%'` display string from exact integer
    * centi-percent: sign ‖ grouped integer part ‖ '.' ‖ 2-digit
    * fraction ‖ '%'; `'0.00%'` when the denominator is NULL/0
    * (`SMT_Reparos_MoM.sql:38-44`). Half-up away from zero on the
    * exact rational — MySQL FORMAT on a double delegates to the C
    * library, so engines disagree in the last ulp; the integer form
    * is the deterministic reading of the same spec. */
  private def growthPctStr(cur: Column, prev: Column): Column = {
    val diff = cur - prev
    val cpAbs = expr(s"(ABS(${cur} - ${prev}) * 20000 + ${prev}) div (2 * ${prev})")
    when(prev.isNull || prev === 0, lit("0.00%"))
      .otherwise(concat(
        when(diff < 0, "-").otherwise(""),
        format_number((cpAbs / 100).cast("long"), 0),
        lit("."), lpad((cpAbs % 100).cast("string"), 2, "0"), lit("%")))
  }

  private def growthPctSql(cur: String, prev: String): String = s"""
    CASE WHEN $prev IS NULL OR $prev = 0 THEN '0.00%'
      ELSE (CASE WHEN $cur - $prev < 0 THEN '-' ELSE '' END)
        || format('{:,}', ((ABS($cur - $prev) * 20000 + $prev) // (2 * $prev)) // 100)
        || '.' || lpad(CAST(((ABS($cur - $prev) * 20000 + $prev) // (2 * $prev)) % 100
             AS VARCHAR), 2, '0') || '%'
    END"""

  private def mensalConsolidado(s: SparkSession, d: String): DataFrame =
    reparos(s, d)
      .groupBy(col("chave_ano"), col("chave_mes"), col("mes_n"))
      .agg(count(lit(1)).as("total_reparos"))

  private val mensalConsolidadoSql: String = s"""
    (SELECT chave_ano, chave_mes, mes_n, COUNT(*) AS total_reparos
     FROM $reparosSql GROUP BY chave_ano, chave_mes, mes_n)"""

  /** R7: `SMT_Reparos_MoM(p_ano)` shape-exact — monthly repair counts,
    * LAG across the FULL series (window before the p_ano filter, so
    * January sees last December), IFNULL-0 'Qtd Anterior', signed
    * absolute delta, FORMAT'd growth string, January→December order
    * (`SMT_Reparos_MoM.sql`). Aliases: Ano→ano, Mes→mes,
    * 'Qtd Atual'→qtd_atual, 'Qtd Anterior'→qtd_anterior,
    * 'Dif. Absoluta'→dif_absoluta, 'Crescimento (%)'→crescimento_pct.
    * mes_n kept as the ordering twin of the reference's hidden sort
    * key. Window is over the ~84-row monthly aggregate (fact-scale agg
    * happens first), so the unpartitioned ordering is safe at any SF. */
  val r7ReparosMom: Q = (s, d) => {
    val w = Window.orderBy(col("chave_ano"), col("mes_n"))
    mensalConsolidado(s, d)
      .withColumn("total_anterior", lag(col("total_reparos"), 1).over(w))
      .filter(col("chave_ano") === pAno)
      .select(
        col("chave_ano").as("ano"),
        upper(col("chave_mes")).as("mes"),
        col("mes_n"),
        col("total_reparos").as("qtd_atual"),
        coalesce(col("total_anterior"), lit(0L)).as("qtd_anterior"),
        (col("total_reparos") - coalesce(col("total_anterior"), lit(0L)))
          .as("dif_absoluta"),
        growthPctStr(col("total_reparos"), col("total_anterior"))
          .as("crescimento_pct"))
      .orderBy(col("mes_n"))
  }

  /** R8: `SMT_Reparos_YoY(p_ano)` shape-exact — same-store LAG
    * partitioned by month, ordered by year (the "LAG jumps 12 months"
    * trick, `SMT_Reparos_YoY.sql:31-33`); otherwise the MoM shape. */
  val r8ReparosYoy: Q = (s, d) => {
    val w = Window.partitionBy(col("mes_n")).orderBy(col("chave_ano"))
    mensalConsolidado(s, d)
      .withColumn("total_ano_anterior", lag(col("total_reparos"), 1).over(w))
      .filter(col("chave_ano") === pAno)
      .select(
        col("chave_ano").as("ano"),
        upper(col("chave_mes")).as("mes"),
        col("mes_n"),
        col("total_reparos").as("qtd_atual"),
        coalesce(col("total_ano_anterior"), lit(0L)).as("qtd_ano_anterior"),
        (col("total_reparos") - coalesce(col("total_ano_anterior"), lit(0L)))
          .as("dif_absoluta_yoy"),
        growthPctStr(col("total_reparos"), col("total_ano_anterior"))
          .as("crescimento_samestore_pct"))
      .orderBy(col("mes_n"))
  }

  // ---------------------------------------------------------------
  // Top-10 template (Ações / Diagnósticos / Fornecedores)
  // ---------------------------------------------------------------

  /** `CONCAT(IFNULL(ROUND(pct, 2), 0), '%')` from exact centi-percent
    * (qtd, total integers): cp/100.0 renders with MySQL's
    * trailing-zero-free double display in both engines. */
  private def pctSobTotalStr(qtd: Column, total: Column): Column =
    concat(coalesce(
      expr(s"((${qtd} * 20000 + ${total}) div (2 * ${total})) / 100.0"),
      lit(0.0)).cast("string"), lit("%"))

  private def pctSobTotalSql(qtd: String, total: String): String =
    s"CAST(COALESCE((($qtd * 20000 + $total) // (2 * $total)) / 100.0, 0.0) AS VARCHAR) || '%'"

  /** The `SMT_Top10_*` procedure template (`SMT_Top10_Acoes.sql`,
    * `SMT_Top10_Diagnosticos.sql`, `SMT_Top10_Fornecedores.sql` are
    * the same query over a different dimension column): optional-
    * parameter sentinel filters (P10: `p_ano = 0 OR …`, `p_mes = '0'
    * OR …`), scalar-subquery total over the SAME filtered base, group
    * by month×year×dimension, '% SOB TOTAL' display string, top-10 by
    * count. `ORDER BY 4 DESC` alone is tie-unstable under LIMIT, so
    * the port appends (mes_n, ano, dim) — determinism deviation,
    * noted. */
  private def top10(dim: String, outAlias: String, remap: Column => Column,
      pMes: String, pAnoParam: Int): Q = (s, d) => {
    val base = reparos(s, d)
      .filter(lit(pAnoParam) === 0 || col("chave_ano") === pAnoParam)
      .filter(lit(pMes) === "0" || upper(col("chave_mes")) === pMes.toUpperCase)
    val grouped = base
      .groupBy(col("chave_mes"), col("mes_n"), col("chave_ano"), col(dim))
      .agg(count(lit(1)).as("qtd"))
      .withColumn("total", sum(col("qtd")).over(Window.partitionBy()))
    grouped.select(
      (if (pMes == "0") lit("ACUMULADO") else upper(col("chave_mes"))).as("mes"),
      col("chave_ano").as("ano"),
      remap(upper(trim(col(dim)))).as(outAlias),
      col("qtd"),
      pctSobTotalStr(col("qtd"), col("total")).as("pct_sob_total"),
      col("mes_n"))
      .orderBy(col("qtd").desc, col("mes_n"), col("ano"), col(outAlias))
      .limit(10)
  }

  private def top10Sql(dimExpr: String, dimCol: String, outAlias: String,
      whereSql: String, mesExpr: String): String = s"""
    WITH base AS (SELECT * FROM $reparosSql WHERE $whereSql),
    total_filtrado AS (SELECT COUNT(*) AS total FROM base),
    grouped AS (
      SELECT chave_mes, mes_n, chave_ano, $dimCol, COUNT(*) AS qtd
      FROM base GROUP BY chave_mes, mes_n, chave_ano, $dimCol)
    SELECT $mesExpr AS mes, chave_ano AS ano, $dimExpr AS $outAlias, qtd,
      ${pctSobTotalSql("qtd", "(SELECT total FROM total_filtrado)")}
        AS pct_sob_total,
      mes_n
    FROM grouped
    ORDER BY qtd DESC, mes_n, ano, $outAlias
    LIMIT 10"""

  /** R9: `SMT_Top10_Acoes('0', 1997)` — the ACUMULADO parameter branch
    * with the procedure's action-label CASE remap
    * (`SMT_Top10_Acoes.sql:20-24`; 'SEM AÇÃO'→'SEM AÇÃO - NO FAULT
    * FOUND' etc. — here the two remapped labels are the two most
    * common p_type values). Aliases: 'MÊS'→mes, 'AÇÕES'→dim,
    * 'QTD'→qtd, '% SOB TOTAL'→pct_sob_total. */
  val r9Top10Acoes: Q = top10("acao_realizada", "acoes",
    c => when(c === "ECONOMY", "SEM AÇÃO - NO FAULT FOUND")
      .when(c === "SMALL", "PENDENTE - AGUARDANDO PEÇA")
      .otherwise(c),
    pMes = "0", pAnoParam = pAno)

  /** R10: `SMT_Top10_Fornecedores('JANEIRO', 0)` — the month-filter
    * parameter branch (all years, one month), no label remap. */
  val r10Top10Fornecedores: Q = top10("fornecedor", "fornecedor", identity,
    pMes = "JANEIRO", pAnoParam = 0)

  // ---------------------------------------------------------------
  // Performance summary + RMA rollup snippet
  // ---------------------------------------------------------------

  /** ROUND(x*100, 2) numeric percent from exact integers → double. */
  private def pctNum(qtd: Column, total: Column): Column =
    expr(s"((${qtd} * 20000 + ${total}) div (2 * ${total})) / 100.0")

  private def pctNumSql(qtd: String, total: String): String =
    s"(($qtd * 20000 + $total) // (2 * $total)) / 100.0"

  /** R11: `vw_SMT_ResumoPerformance` shape-exact — per-year totals,
    * per-origem conditional counts (A3), distinct-technician count,
    * ROUND(total/técnicos, 0) mean and ROUND(share*100, 2) percents as
    * NUMERIC doubles (the view, unlike the RMA snippet, does not
    * stringify). Aliases: 'QTD PRODUÇÃO'→qtd_producao etc.,
    * 'MÉDIA POR TÉCNICO'→media_por_tecnico, '% X'→pct_x. The view has
    * no ORDER BY; ano added for determinism. */
  val r11ResumoPerformance: Q = (s, d) =>
    reparos(s, d)
      .groupBy(col("chave_ano").as("ano"))
      .agg(
        count(lit(1)).as("qtd_total"),
        sum(when(col("origem") === "PRODUÇÃO", 1).otherwise(0)).as("qtd_producao"),
        sum(when(col("origem") === "ASSISTÊNCIA", 1).otherwise(0)).as("qtd_assistencia"),
        sum(when(col("origem") === "SMT", 1).otherwise(0)).as("qtd_smt"),
        countDistinct(col("tecnico")).as("tecnicos"))
      .withColumn("media_por_tecnico", expr(
        """CASE WHEN tecnicos = 0 THEN NULL
           ELSE CAST((2 * qtd_total + tecnicos) div (2 * tecnicos) AS DOUBLE) END"""))
      // cast("double"): pctNum's `/ 100.0` is DECIMAL division in Spark
      // (decimal(27,6) in the parquet dump) but DOUBLE in DuckDB — the
      // values agree yet the driver's hash sees different types. The
      // decimal→double conversion is exact-rational correctly rounded,
      // as is DuckDB's bigint/100.0, so the doubles are bit-identical.
      .withColumn("pct_producao",
        pctNum(col("qtd_producao"), col("qtd_total")).cast("double"))
      .withColumn("pct_assistencia",
        pctNum(col("qtd_assistencia"), col("qtd_total")).cast("double"))
      .withColumn("pct_smt",
        pctNum(col("qtd_smt"), col("qtd_total")).cast("double"))
      .orderBy(col("ano"))

  /** R12: `SMT_Snippet_RMA` shape-exact — the ResumoPerformance
    * aggregate WITH ROLLUP ("o segredo está aqui",
    * `SMT_Snippet_RMA.sql:20`): grand-total row where COUNT(DISTINCT
    * tecnico) re-counts globally (not a sum of per-year counts),
    * IFNULL(CAST(ano AS CHAR), 'TOTAL GERAL'), percent display STRINGS,
    * total-last ordering `(chave_ano IS NULL) ASC, chave_ano` carried
    * by the g twin. */
  val r12SnippetRma: Q = (s, d) =>
    reparos(s, d)
      .rollup(col("chave_ano"))
      .agg(
        grouping(col("chave_ano")).cast("int").as("g"),
        count(lit(1)).as("qtd_total"),
        sum(when(col("origem") === "PRODUÇÃO", 1).otherwise(0)).as("qtd_producao"),
        sum(when(col("origem") === "ASSISTÊNCIA", 1).otherwise(0)).as("qtd_assistencia"),
        sum(when(col("origem") === "SMT", 1).otherwise(0)).as("qtd_smt"),
        countDistinct(col("tecnico")).as("tecnicos_ativos"))
      .select(
        coalesce(col("chave_ano").cast("string"), lit("TOTAL GERAL")).as("ano"),
        col("qtd_total"), col("qtd_producao"), col("qtd_assistencia"),
        col("qtd_smt"), col("tecnicos_ativos"),
        expr("""CASE WHEN tecnicos_ativos = 0 THEN NULL
             ELSE CAST((2 * qtd_total + tecnicos_ativos)
                       div (2 * tecnicos_ativos) AS DOUBLE) END""")
          .as("media_por_tecnico"),
        concat(coalesce(pctNum(col("qtd_producao"), col("qtd_total")), lit(0.0))
          .cast("string"), lit("%")).as("pct_producao"),
        concat(coalesce(pctNum(col("qtd_assistencia"), col("qtd_total")), lit(0.0))
          .cast("string"), lit("%")).as("pct_assistencia"),
        concat(coalesce(pctNum(col("qtd_smt"), col("qtd_total")), lit(0.0))
          .cast("string"), lit("%")).as("pct_smt"),
        col("g"))
      .orderBy(col("g"), col("ano"))

  // ---------------------------------------------------------------
  // Recurrence-of-repair report
  // ---------------------------------------------------------------

  /** R13: `SMT_Reincidencia_Reparos(p_ano)` shape-exact — per physical
    * unit (num_serie × sku × produto from the deduplicated "estoque"
    * lookup, J7), repair count HAVING > 1, ordered technician chain
    * `' -> '` (A7 — GROUP_CONCAT(DISTINCT) made deterministic by
    * sorting), MIN/MAX repair dates. NULL/''-key guards kept from the
    * procedure even though the analog never produces them. ORDER BY
    * reincidencia DESC + num_serie tiebreak (determinism deviation).
    * Aliases: 'NUM. SERIE'→num_serie, 'DESCRIÇÃO'→produto,
    * 'REINCIDÊNCIA'→reincidencia, 'TÉCNICOS'→tecnicos,
    * 'PRIMEIRA/ÚLTIMA ENTRADA'→primeira/ultima_entrada. */
  val r13ReincidenciaReparos: Q = (s, d) => {
    val estoque = Tables.part(s, d)
      .select(col("p_partkey").as("e_sku"), col("p_name").as("produto"))
      .distinct()
    reparos(s, d)
      .filter(col("chave_ano") === pAno)
      .filter(col("num_serie").isNotNull && col("num_serie") =!= "" &&
        col("sku").isNotNull)
      .join(broadcast(estoque), col("sku") === col("e_sku"), "left")
      .filter(col("produto").isNotNull)
      .groupBy(col("num_serie"), col("sku"), col("produto"))
      .agg(
        count(lit(1)).as("reincidencia"),
        array_join(array_sort(collect_set(col("tecnico"))), " -> ")
          .as("tecnicos"),
        min(col("data_reparo")).as("primeira_entrada"),
        max(col("data_reparo")).as("ultima_entrada"))
      .filter(col("reincidencia") > 1)
      .orderBy(col("reincidencia").desc, col("num_serie"))
  }

  // ---------------------------------------------------------------
  // Scrap-rate procedures (both conditional-sort branches, O3)
  // ---------------------------------------------------------------

  /** The `Scrap_Por_Peça` / `SMT_Scrap_SKU` template — the same query
    * except SKU resolves produto through the deduplicated estoque
    * lookup (J7) while Por_Peça reads the inline `produto_desc`.
    * Per SKU×month: entries, scrap count, '% DE SCRAP' string; HAVING
    * `COUNT(*) > 5 AND scrap > 0` (A6); the reference's two mutually
    * exclusive CASE sort keys (O3) — chronological when p_mes='TUDO',
    * scrap-ratio DESC otherwise — kept verbatim, with a sku tiebreak
    * appended (no LIMIT, so ties only affect display order, not
    * content).
    *
    * The scrap "SKU" is the repair LINE (supplier key), not the part:
    * parts per repair scale with SF, so a part×month group never
    * reaches the procedure's `> 5` entry floor at any test scale,
    * while lines×months keep a scale-invariant ~7 entries/group —
    * the same density the reference's few-hundred-product staging
    * table has. */
  private def scrap(viaEstoque: Boolean, pMes: String): Q = (s, d) => {
    val base0 = reparos(s, d)
      .filter(col("chave_ano") === pAno)
      .filter(lit(pMes) === "TUDO" || col("chave_mes") === pMes)
    val base =
      if (!viaEstoque) base0.withColumn("produto",
        concat(lit("LINHA "), col("linha_sku")))
      else {
        val estoque = Tables.supplier(s, d)
          .select(col("s_suppkey").as("e_sku"), col("s_name").as("produto"))
          .distinct()
        base0.join(broadcast(estoque), col("linha_sku") === col("e_sku"), "left")
          .filter(col("produto").isNotNull)
      }
    val sortChrono =
      if (pMes == "TUDO") col("mes_n") else lit(null).cast("int")
    val sortPct =
      if (pMes != "TUDO") col("total_scrap").cast("double") / col("entradas")
      else lit(null).cast("double")
    base
      .groupBy(col("linha_sku").as("sku"), col("produto"),
        col("chave_mes").as("mes"),
        col("mes_n"), col("chave_ano").as("ano"))
      .agg(count(lit(1)).as("entradas"),
        sum(when(col("situacao") === "SCRAP", 1).otherwise(0))
          .as("total_scrap"))
      .filter(col("entradas") > 5 && col("total_scrap") > 0)
      .withColumn("pct_de_scrap",
        pctSobTotalStr(col("total_scrap"), col("entradas")))
      .select(col("sku"), col("produto"), col("mes"), col("mes_n"),
        col("ano"), col("entradas"), col("total_scrap"), col("pct_de_scrap"))
      .orderBy(sortChrono.asc, sortPct.desc, col("sku"))
  }

  private def scrapSql(produtoExpr: String, fromSql: String,
      whereMes: String, orderSql: String): String = s"""
    SELECT linha_sku AS sku, $produtoExpr AS produto, chave_mes AS mes, mes_n,
      chave_ano AS ano, COUNT(*) AS entradas,
      CAST(SUM(CASE WHEN situacao = 'SCRAP' THEN 1 ELSE 0 END) AS BIGINT)
        AS total_scrap,
      ${pctSobTotalSql(
        "CAST(SUM(CASE WHEN situacao = 'SCRAP' THEN 1 ELSE 0 END) AS BIGINT)",
        "COUNT(*)")} AS pct_de_scrap
    FROM $fromSql
    WHERE chave_ano = $pAno $whereMes
    GROUP BY linha_sku, $produtoExpr, chave_mes, mes_n, chave_ano
    HAVING COUNT(*) > 5
       AND SUM(CASE WHEN situacao = 'SCRAP' THEN 1 ELSE 0 END) > 0
    ORDER BY $orderSql, sku"""

  /** R14: `SMT_Scrap_SKU('TUDO', 1997)` — estoque-join variant on the
    * chronological-sort branch. Aliases: 'DESCRIÇÃO PRODUTO'→produto,
    * 'ENTRADAS'→entradas, 'TOTAL SCRAP'→total_scrap,
    * '% DE SCRAP'→pct_de_scrap. */
  val r14ScrapSku: Q = scrap(viaEstoque = true, pMes = "TUDO")

  /** R15: `Scrap_Por_Peça('MARÇO', 1997)` — inline-produto variant on
    * the scrap-ratio sort branch. */
  val r15ScrapPorPeca: Q = scrap(viaEstoque = false, pMes = "MARÇO")

  val defs: Map[String, Q] = Map(
    "r7_reparos_mom" -> r7ReparosMom,
    "r8_reparos_yoy" -> r8ReparosYoy,
    "r9_top10_acoes" -> r9Top10Acoes,
    "r10_top10_fornecedores" -> r10Top10Fornecedores,
    "r11_resumo_performance" -> r11ResumoPerformance,
    "r12_snippet_rma" -> r12SnippetRma,
    "r13_reincidencia_reparos" -> r13ReincidenciaReparos,
    "r14_scrap_sku" -> r14ScrapSku,
    "r15_scrap_por_peca" -> r15ScrapPorPeca)

  private val momYoySelect: (String, String, String, String) => String =
    (prevExpr, qtdPrevAlias, difAlias, pctAlias) => s"""
      SELECT chave_ano AS ano, UPPER(chave_mes) AS mes, mes_n,
        total_reparos AS qtd_atual,
        COALESCE($prevExpr, 0) AS $qtdPrevAlias,
        total_reparos - COALESCE($prevExpr, 0) AS $difAlias,
        ${growthPctSql("total_reparos", prevExpr)} AS $pctAlias
      FROM lagged WHERE chave_ano = $pAno ORDER BY mes_n"""

  val oracles: Map[String, String] = Map(
    "r7_reparos_mom" -> s"""
      WITH lagged AS (
        SELECT *, LAG(total_reparos) OVER (ORDER BY chave_ano, mes_n)
          AS total_anterior
        FROM $mensalConsolidadoSql)
      ${momYoySelect("total_anterior", "qtd_anterior", "dif_absoluta",
        "crescimento_pct")}""",
    "r8_reparos_yoy" -> s"""
      WITH lagged AS (
        SELECT *, LAG(total_reparos) OVER (PARTITION BY mes_n ORDER BY chave_ano)
          AS total_ano_anterior
        FROM $mensalConsolidadoSql)
      ${momYoySelect("total_ano_anterior", "qtd_ano_anterior",
        "dif_absoluta_yoy", "crescimento_samestore_pct")}""",
    "r9_top10_acoes" -> top10Sql(
      dimExpr = """CASE WHEN UPPER(TRIM(acao_realizada)) = 'ECONOMY'
          THEN 'SEM AÇÃO - NO FAULT FOUND'
        WHEN UPPER(TRIM(acao_realizada)) = 'SMALL'
          THEN 'PENDENTE - AGUARDANDO PEÇA'
        ELSE UPPER(TRIM(acao_realizada)) END""",
      dimCol = "acao_realizada",
      outAlias = "acoes",
      whereSql = s"chave_ano = $pAno",
      mesExpr = "'ACUMULADO'"),
    "r10_top10_fornecedores" -> top10Sql(
      dimExpr = "UPPER(TRIM(fornecedor))",
      dimCol = "fornecedor",
      outAlias = "fornecedor",
      whereSql = "UPPER(chave_mes) = 'JANEIRO'",
      mesExpr = "UPPER(chave_mes)"),
    "r11_resumo_performance" -> s"""
      WITH agg AS (
        SELECT chave_ano AS ano, COUNT(*) AS qtd_total,
          CAST(SUM(CASE WHEN origem = 'PRODUÇÃO' THEN 1 ELSE 0 END) AS BIGINT)
            AS qtd_producao,
          CAST(SUM(CASE WHEN origem = 'ASSISTÊNCIA' THEN 1 ELSE 0 END) AS BIGINT)
            AS qtd_assistencia,
          CAST(SUM(CASE WHEN origem = 'SMT' THEN 1 ELSE 0 END) AS BIGINT)
            AS qtd_smt,
          COUNT(DISTINCT tecnico) AS tecnicos
        FROM $reparosSql GROUP BY chave_ano)
      SELECT ano, qtd_total, qtd_producao, qtd_assistencia, qtd_smt, tecnicos,
        CASE WHEN tecnicos = 0 THEN NULL
          ELSE CAST((2 * qtd_total + tecnicos) // (2 * tecnicos) AS DOUBLE) END
          AS media_por_tecnico,
        ${pctNumSql("qtd_producao", "qtd_total")} AS pct_producao,
        ${pctNumSql("qtd_assistencia", "qtd_total")} AS pct_assistencia,
        ${pctNumSql("qtd_smt", "qtd_total")} AS pct_smt
      FROM agg ORDER BY ano""",
    "r12_snippet_rma" -> s"""
      WITH rolled AS (
        SELECT CAST(GROUPING(chave_ano) AS INT) AS g, chave_ano,
          COUNT(*) AS qtd_total,
          CAST(SUM(CASE WHEN origem = 'PRODUÇÃO' THEN 1 ELSE 0 END) AS BIGINT)
            AS qtd_producao,
          CAST(SUM(CASE WHEN origem = 'ASSISTÊNCIA' THEN 1 ELSE 0 END) AS BIGINT)
            AS qtd_assistencia,
          CAST(SUM(CASE WHEN origem = 'SMT' THEN 1 ELSE 0 END) AS BIGINT)
            AS qtd_smt,
          COUNT(DISTINCT tecnico) AS tecnicos_ativos
        FROM $reparosSql GROUP BY ROLLUP (chave_ano))
      SELECT COALESCE(CAST(chave_ano AS VARCHAR), 'TOTAL GERAL') AS ano,
        qtd_total, qtd_producao, qtd_assistencia, qtd_smt, tecnicos_ativos,
        CASE WHEN tecnicos_ativos = 0 THEN NULL
          ELSE CAST((2 * qtd_total + tecnicos_ativos) // (2 * tecnicos_ativos)
                    AS DOUBLE) END AS media_por_tecnico,
        CAST(COALESCE(${pctNumSql("qtd_producao", "qtd_total")}, 0.0) AS VARCHAR)
          || '%' AS pct_producao,
        CAST(COALESCE(${pctNumSql("qtd_assistencia", "qtd_total")}, 0.0) AS VARCHAR)
          || '%' AS pct_assistencia,
        CAST(COALESCE(${pctNumSql("qtd_smt", "qtd_total")}, 0.0) AS VARCHAR)
          || '%' AS pct_smt,
        g
      FROM rolled ORDER BY g, ano""",
    "r14_scrap_sku" -> scrapSql(
      produtoExpr = "produto",
      fromSql = s"""($reparosSql r LEFT JOIN
        (SELECT DISTINCT s_suppkey AS e_sku, s_name AS produto FROM supplier) e
        ON r.linha_sku = e.e_sku)""",
      whereMes = "AND produto IS NOT NULL",
      orderSql = "mes_n ASC"),
    "r15_scrap_por_peca" -> scrapSql(
      produtoExpr = "'LINHA ' || CAST(linha_sku AS VARCHAR)",
      fromSql = reparosSql,
      whereMes = "AND chave_mes = 'MARÇO'",
      orderSql =
        "CAST(SUM(CASE WHEN situacao = 'SCRAP' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) DESC"),
    "r13_reincidencia_reparos" -> s"""
      WITH estoque AS (SELECT DISTINCT p_partkey AS e_sku, p_name AS produto
                       FROM part)
      SELECT num_serie, sku, produto,
        COUNT(*) AS reincidencia,
        array_to_string(list_sort(list(DISTINCT tecnico)), ' -> ') AS tecnicos,
        MIN(data_reparo) AS primeira_entrada,
        MAX(data_reparo) AS ultima_entrada
      FROM $reparosSql r
      LEFT JOIN estoque e ON r.sku = e.e_sku
      WHERE chave_ano = $pAno
        AND num_serie IS NOT NULL AND num_serie <> ''
        AND sku IS NOT NULL AND produto IS NOT NULL
      GROUP BY num_serie, sku, produto
      HAVING COUNT(*) > 1
      ORDER BY reincidencia DESC, num_serie""")
}
