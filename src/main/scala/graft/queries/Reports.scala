package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** R1: seller performance rollup — shape-exact port of
    * `CALL Cenario_Faturamento` (`Códigos Úteis SQL/CALL
    * Cenario_Faturamento.sql:31-103`): inner per-seller aggregation
    * (faturado, itens, distinct partners, GAP clamped at 0 BEFORE the
    * total sum), then ROLLUP over seller only — the grand-total row
    * gets meta × n_vendedores, summed clamped GAPs, VLM = faturado /
    * distinct partners (NULLIF-guarded), atingimento % against the
    * grouping-dependent meta, BATEU/FORA status, BRL display strings
    * beside the numeric ordering twin, total-row-last ordering. The
    * c_mktsegment plays `vendedor`; the meta is the procedure's
    * constant per-seller target. */
  val r1CenarioFaturamento: Q = (s, d) => {
    val metaIndividual = 700000000.0
    val inner = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment").as("vendedor"))
      .agg(
        sum(dec2(col("o_totalprice"))).as("faturado_dec"),
        count(lit(1)).as("itens"),
        countDistinct(col("c_custkey")).as("conversao"))
      .withColumn("gap_para_soma",
        greatest(lit(metaIndividual).cast("decimal(18,2)") - col("faturado_dec"),
          lit(0).cast("decimal(18,2)")))
    val rolled = inner.rollup(col("vendedor"))
      .agg(
        grouping(col("vendedor")).cast("int").as("g"),
        sum(col("faturado_dec")).as("fat_dec"),
        sum(col("itens")).as("itens"),
        sum(col("conversao")).as("conversao"),
        sum(col("gap_para_soma")).as("gap_dec"),
        count(lit(1)).as("n_vendedores"))
    rolled
      .withColumn("faturado", col("fat_dec").cast("double"))
      .withColumn("meta_apropriada",
        when(col("g") === 1, lit(metaIndividual) * col("n_vendedores"))
          .otherwise(lit(metaIndividual)))
      .withColumn("atingimento",
        when(col("meta_apropriada") === 0, lit(null))
          .otherwise(col("faturado") / col("meta_apropriada") * 100))
      // VLM as exact integer-cents mean (see r5 note on double→decimal
      // formatting divergence at half-cent boundaries)
      .withColumn("vlm_valor", expr(
        """CASE WHEN conversao = 0 THEN NULL
           ELSE ((CAST(fat_dec * 100 AS BIGINT) * 2 + conversao)
                 div (2 * conversao)) / 100.0 END"""))
      .select(
        coalesce(col("vendedor"), lit("Total Geral")).as("vendedor"),
        formatBrl(col("meta_apropriada")).as("meta_vendedor"),
        formatBrl(col("faturado")).as("faturado_fmt"),
        col("faturado"),
        formatBrl(col("gap_dec").cast("double")).as("gap_fmt"),
        col("itens"), col("conversao"),
        formatBrl(col("vlm_valor")).as("vlm"),
        format_string("%.2f%%", col("atingimento")).as("atingimento_str"),
        when(col("atingimento") > 100, "BATEU META")
          .otherwise("FORA DA META").as("status_meta"),
        col("g"))
      .orderBy(col("g").asc, col("faturado").desc)
  }

  /** R2: recurrence base — shape-exact port of `vw_recorrencia_base`
    * (`ScriptsSQL - Constance/vw_recorrencia_base.sql:1-45`):
    * per-seller conditional counts of recurrence groups 0/1/2/>=3
    * (A3), NOT-IN exclusion (P7), Recorrentes/Total_Base, Recorrencia
    * as a percent STRING beside the numeric ordering twin (F14 duality,
    * §7.4 risk 2), UNION ALL team-total row, ordered total-last then
    * pct desc. Here `vendedor` = c_mktsegment and the recurrence group
    * is the customer's 1997 order count (1 → '0', 2 → '1', 3 → '2',
    * ≥4 → '>=3'), with the active-base filter = bought in 1997. */
  val r2RecorrenciaBase: Q = (s, d) => {
    val perCustomer = Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(year(col("o_orderdate")) === 1997),
        col("c_custkey") === col("o_custkey"))
      .filter(!col("c_mktsegment").isin("<SEM VENDEDOR>"))
      .groupBy(col("c_mktsegment").as("vendedor"), col("c_custkey"))
      .agg(count(lit(1)).as("n_pedidos"))
      .withColumn("grupo_recorrencia",
        when(col("n_pedidos") === 1, "0")
          .when(col("n_pedidos") === 2, "1")
          .when(col("n_pedidos") === 3, "2")
          .otherwise(">=3"))
    val cte = perCustomer.groupBy(col("vendedor"))
      .agg(
        sum(when(col("grupo_recorrencia") === "0", 1).otherwise(0)).as("c_0"),
        sum(when(col("grupo_recorrencia") === "1", 1).otherwise(0)).as("c_1"),
        sum(when(col("grupo_recorrencia") === "2", 1).otherwise(0)).as("c_2"),
        sum(when(col("grupo_recorrencia") === ">=3", 1).otherwise(0)).as("c_3_mais"))
    val detail = cte.select(
      col("vendedor"),
      (col("c_0") + col("c_1") + col("c_2") + col("c_3_mais")).as("Total_Base"),
      (col("c_1") + col("c_2") + col("c_3_mais")).as("Recorrentes"),
      lit(0).as("linha_total"))
    val total = cte.agg(
      sum(col("c_0") + col("c_1") + col("c_2") + col("c_3_mais")).as("Total_Base"),
      sum(col("c_1") + col("c_2") + col("c_3_mais")).as("Recorrentes"))
      .select(lit("--- TOTAL DA EQUIPE ---").as("vendedor"),
        col("Total_Base"), col("Recorrentes"), lit(1).as("linha_total"))
    detail.unionByName(total)
      .withColumn("perc_ordenacao",
        col("Recorrentes").cast("double") /
          when(col("Total_Base") === 0, lit(null)).otherwise(col("Total_Base")))
      .withColumn("Recorrencia",
        concat(round(col("perc_ordenacao") * 100, 2).cast("string"), lit("%")))
      .select(col("vendedor"), col("Recorrentes"), col("Total_Base"),
        col("Recorrencia"), col("perc_ordenacao"), col("linha_total"))
      .orderBy(col("linha_total").asc, col("perc_ordenacao").desc)
  }

  /** R3: multi-level view composition through Spark SQL text — exact
    * port of `vw_recorrencia_alertas.sql` consuming the base view
    * (SURVEY §3.2): registered temp view + `spark.sql`, parsing the
    * percent STRING back (F13) for the CRÍTICO/ATENÇÃO/NORMAL ladder. */
  val r3RecorrenciaAlertas: Q = (s, d) => {
    r2RecorrenciaBase(s, d).createOrReplaceTempView("vw_recorrencia_base")
    s.sql("""
      SELECT vendedor, Recorrentes, Total_Base, Recorrencia,
        CASE
          WHEN CAST(REPLACE(Recorrencia, '%', '') AS DECIMAL(10,2)) < 40.00
            THEN 'CRÍTICO'
          WHEN CAST(REPLACE(Recorrencia, '%', '') AS DECIMAL(10,2)) <= 47.00
            THEN 'ATENÇÃO'
          ELSE 'NORMAL'
        END AS Status_Fidelizacao
      FROM vw_recorrencia_base
      ORDER BY linha_total, perc_ordenacao DESC""")
  }

  /** R4: delinquency base — shape-exact port of
    * `vw_Inadimplencia_Base.sql`: two CTEs (active base count ·
    * range-conditional delinquency sums) left-joined per seller,
    * IFNULL defaults, BRL + percent display strings beside the numeric
    * ordering twin, UNION ALL team-total row, ordered total-last then
    * pct desc. Analog: vendedor = c_mktsegment; "delinquent 1-31 days"
    * = open order aged 100-500 days vs the injected clock; limite =
    * total order value. */
  val r4InadimplenciaBase: Q = (s, d) => {
    val orders = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(!col("c_mktsegment").isin("<SEM VENDEDOR>"))
      .withColumn("vendedor", col("c_mktsegment"))
      .withColumn("atraso",
        datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate"))))
    val inadCond = col("o_orderstatus") === "O" &&
      col("atraso").between(100, 500)
    val cteAtivos = orders.filter(year(col("o_orderdate")) === 1997)
      .groupBy(col("vendedor").as("v_a"))
      .agg(countDistinct(col("c_custkey")).as("ativos_num"))
    val cteInad = orders.groupBy(col("vendedor"))
      .agg(
        sum(when(inadCond, dec2(col("o_totalprice")))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("valor_dec"),
        sum(when(inadCond, 1).otherwise(0)).as("qtd_num"),
        sum(dec2(col("o_totalprice"))).as("limite_dec"))
    val joined = cteInad
      .join(cteAtivos, col("vendedor") === col("v_a"), "left")
      .select(col("vendedor"),
        coalesce(col("ativos_num"), lit(0L)).as("Ativos"),
        col("qtd_num").as("QTD"), col("valor_dec"), col("limite_dec"))
    val detail = joined.withColumn("linha_total", lit(0))
    val total = joined.agg(
      sum(col("Ativos")).as("Ativos"), sum(col("QTD")).as("QTD"),
      sum(col("valor_dec")).as("valor_dec"),
      sum(col("limite_dec")).as("limite_dec"))
      .select(lit("--- TOTAL DA EQUIPE ---").as("vendedor"), col("Ativos"),
        col("QTD"), col("valor_dec"), col("limite_dec"), lit(1).as("linha_total"))
    detail.unionByName(total)
      .withColumn("perc_ordenacao",
        col("QTD").cast("double") /
          when(col("Ativos") === 0, lit(null)).otherwise(col("Ativos")))
      .select(col("vendedor"), col("Ativos"), col("QTD"),
        formatBrl(col("valor_dec").cast("double")).as("Valor"),
        concat(round(col("perc_ordenacao") * 100, 2).cast("string"), lit("%"))
          .as("Inadimplencia"),
        formatBrl(col("limite_dec").cast("double")).as("Limite_Credito"),
        col("perc_ordenacao"), col("linha_total"))
      .orderBy(col("linha_total").asc, col("perc_ordenacao").desc)
  }

  /** R5: SDR management panel — shape-exact port of
    * `PainelSDR_Gerencial.sql` (J8: three grouped subqueries merged by
    * LEFT JOINs on COALESCE keys; F15 pt-BR month-name parameter; P7
    * NOT-IN exclusion; M5 tiered prize ladder ×80/110/130/140 + fixed
    * salary; BRL and percent display strings; NULLIF-guarded
    * conversion). Analog: SDR = c_mktsegment, cadastros = distinct
    * buyers in the month, primeiro-pedido = customers whose FIRST-EVER
    * order lands in the month. */
  def r5PainelSdr(mesPt: String, ano: Int): Q = (s, d) => {
    import s.implicits._
    val mesN = monthsPt.indexOf(mesPt.toUpperCase(java.util.Locale.ROOT)) + 1
    val excluded = Seq("<SEM SDR>")
    val co = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(!col("c_mktsegment").isin(excluded.map(x => x: Any): _*))
    // scc: distinct clients registered (= buying) in the period
    val scc = co
      .filter(year(col("o_orderdate")) === ano && month(col("o_orderdate")) === mesN)
      .groupBy(col("c_mktsegment").as("sdr_c"))
      .agg(countDistinct(col("c_custkey")).as("qtd_cadastros"))
    // spp: first-ever orders landing in the period (row_number with a
    // full tiebreak so both engines pick the identical first order)
    val wFirst = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"), col("c_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val firstOrder = co
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(wFirst))
      .filter(col("rn") === 1)
      .select(col("c_mktsegment").as("sdr"),
        col("o_orderdate").as("primeira_data"),
        col("o_orderkey").as("primeiro_pedido"),
        dec2(col("o_totalprice")).as("valor_primeiro"))
    // mean as exact integer cents with half-up integer division: a
    // double mean near a half-cent boundary formats differently across
    // engines (Spark casts double→decimal via the shortest string
    // repr; DuckDB uses the exact binary value)
    val spp = firstOrder
      .filter(year(col("primeira_data")) === ano && month(col("primeira_data")) === mesN)
      .groupBy(col("sdr").as("sdr_p"))
      .agg(count(lit(1)).as("prim_pedido_num"),
        (sum(col("valor_primeiro")) * 100).cast("long").as("cents_sum"),
        countDistinct(col("primeiro_pedido")).as("n_ped"))
      .withColumn("valor_medio",
        expr("((cents_sum * 2 + n_ped) div (2 * n_ped)) / 100.0"))
    // msdr: meta dim (inline literal)
    val msdr = Seq(("AUTOMOBILE", 25), ("BUILDING", 25), ("FURNITURE", 20),
      ("HOUSEHOLD", 22), ("MACHINERY", 25)).toDF("sdr_m", "meta_nv_loja")
    val merged = scc
      .join(spp, col("sdr_c") === col("sdr_p"), "left")
      .join(broadcast(msdr), coalesce(col("sdr_c"), col("sdr_p")) === col("sdr_m"), "left")
      .select(
        lit(ano).as("Ano"), lit(mesPt).as("Mes"),
        coalesce(col("sdr_c"), col("sdr_p"), col("sdr_m")).as("NomeSDR"),
        coalesce(col("meta_nv_loja"), lit(0)).cast("string").as("MetaPedidos"),
        coalesce(col("qtd_cadastros"), lit(0L)).as("QtdCadastros"),
        coalesce(col("prim_pedido_num"), lit(0L)).as("PriPedido"),
        formatBrl(coalesce(col("valor_medio"), lit(0.0))).as("VLMReal"),
        format_string("%.2f%%",
          coalesce(col("prim_pedido_num").cast("double") /
            when(col("qtd_cadastros") === 0, lit(null))
              .otherwise(col("qtd_cadastros")) * 100, lit(0.0)))
          .as("pct_conversao"))
    val n = col("PriPedido")
    val premio = when(n.between(0, 2), lit(0.0))
      .when(n.between(3, 7), n * 80.0)
      .when(n.between(8, 11), n * 110.0)
      .when(n.between(12, 14), n * 130.0)
      .when(n >= 15, n * 140.0)
      .otherwise(lit(0.0))
    merged
      .withColumn("Premio", formatBrl(premio))
      .withColumn("PremioMaisSalario", formatBrl(premio + 2290.0))
      .orderBy(col("NomeSDR"))
  }

  /** R6: production SLA report — condensed port of `SQLServer -
    * Scripts/SLA de Produção - Completo.sql` keeping its distinctive
    * composition: dims joined inner ("trava antinulo"), per-order MAX
    * expedition PRE-AGGREGATED before the join (the reference's
    * shrink-build-side CTE, SURVEY §4), SLA deadline = start + 2 days
    * (F22), lead time decomposed to padded HH:MM:SS (F21) plus day
    * count, NO PRAZO/ATRASADO flag, and the legacy+serial UNION ALL
    * consolidation with aligned columns (U1). */
  val r6SlaProducao: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val orders = Tables.orders(s, d)
    // EXPEDICAO_MAX analog: pre-aggregate before joining (build side
    // shrinks from |lineitem| to |orders|)
    val expedicaoMax = li.groupBy(col("l_orderkey").as("ok_exp"))
      .agg(max(col("l_shipdate")).as("ultima_expedicao"))
    def branch(statusFilter: Column, origem: String): DataFrame =
      li.join(orders.filter(statusFilter), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .join(expedicaoMax, col("l_orderkey") === col("ok_exp"), "left")
        .withColumn("prazo_sla", date_add(to_date(col("o_orderdate")), 2))
        .withColumn("segundos",
          unix_timestamp(col("l_shipdate")) - unix_timestamp(col("o_orderdate")))
        .select(
          col("l_orderkey").as("ordem"), col("l_linenumber").as("item"),
          col("p_brand").as("marca"),
          col("prazo_sla"),
          leadTimeHms(col("segundos")).as("lt_hms"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .as("lt_dias"),
          when(to_date(col("l_shipdate")) <= col("prazo_sla"), "NO PRAZO")
            .otherwise("ATRASADO").as("status_sla"),
          to_date(col("ultima_expedicao")).as("ultima_expedicao"),
          lit(origem).as("origem"))
    branch(col("o_orderstatus") === "F", "LEGADO")
      .unionByName(branch(col("o_orderstatus") =!= "F", "SERIAL"))
      .orderBy(col("ordem"), col("item"))
  }

  /** R20: `CTE - Check de Integridade e Balanço Ativo-Passivo.sql`
    * shape-exact: classify rows by description substring (F10), ROLLUP
    * per company with IFNULL 'TOTAL DO GRUPO' label (A8), pt-BR money
    * display strings (F14), ROUND'd integrity sum and the
    * ÍNTEGRO/INCONSISTENTE status CASE (the reference's accounting
    * identity audit, SURVEY §5). Analog: lineitem plays `source`
    * (VALUE = l_extendedprice), supplier plays `empresa`, returnflag
    * plays the ATIVO/PASSIVO description; one month window as in the
    * reference's ETAPA 1. */
  val r20BalancoIntegridade: Q = (s, d) => {
    val base = Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-02-01"))
      .select(dec2(col("l_extendedprice")).as("valor_num"),
        col("s_name").as("nome_empresa"),
        when(col("l_returnflag") === "A", "ATIVO")
          .when(col("l_returnflag") === "R", "PASSIVO")
          .otherwise("OUTRO").as("tipo"))
    base.rollup(col("nome_empresa"))
      .agg(
        sum(when(col("tipo") === "ATIVO", col("valor_num"))
          .otherwise(lit(0).cast("decimal(15,2)"))).as("ta"),
        sum(when(col("tipo") === "PASSIVO", col("valor_num"))
          .otherwise(lit(0).cast("decimal(15,2)"))).as("tp"),
        // grouping() is only legal inside the rollup's own agg
        grouping(col("nome_empresa")).cast("int").as("linha_total"))
      .select(
        coalesce(col("nome_empresa"), lit("TOTAL DO GRUPO")).as("empresa"),
        col("linha_total"),
        formatBrl(col("ta").cast("double")).as("total_ativo_fmt"),
        formatBrl(col("tp").cast("double")).as("total_passivo_fmt"),
        round(col("ta") + col("tp"), 2).cast("double").as("check_integridade"),
        when(abs(col("ta") + col("tp")) < 0.01, "ÍNTEGRO")
          .otherwise("INCONSISTENTE").as("status"))
      .orderBy(col("linha_total"), col("empresa"))
  }

  /** R21: plan-vs-actual reconciliation with CVP%
    * (`ValidadorProduçãoPorSku.sql:44-66`): product dim left-joined to
    * two PRE-AGGREGATED CTEs (planned per SKU · produced per SKU),
    * COALESCE-0 defaults, zero-guarded CVP% = produced/planned. The
    * percent is computed as half-up integer centi-units (the r16
    * crescStr trick) for engine-stable DECIMAL(5,2) semantics.
    * Analog: planned = all ordered qty per part; produced = qty
    * shipped before the cutoff; the reference's single-SKU WHERE is
    * the optional `sku` parameter (S8 stored-proc shape). */
  def r21CvpSku(sku: Option[Long]): Q = (s, d) => {
    // the reference's two CTEs (planned · produced) condense into ONE
    // conditional aggregation over a single lineitem scan + ONE join
    // — same values (coalesce-0 on both sides), half the scans and
    // shuffles; the SQL oracle keeps the reference's two-CTE text and
    // the hash compare proves the equivalence
    val agg = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(
        sum(col("l_quantity").cast("int")).as("qtd_planejada"),
        sum(when(col("l_shipdate") < lit("1997-01-01"),
          col("l_quantity").cast("int")).otherwise(0)).as("qtd_produzida"))
    val base = Tables.part(s, d)
      .join(agg, col("p_partkey") === col("l_partkey"), "left")
      .select(col("p_partkey").as("cod_produto"),
        col("p_name").as("descricao"), col("p_brand").as("marca"),
        coalesce(col("qtd_produzida"), lit(0L)).as("qtd_produzida"),
        coalesce(col("qtd_planejada"), lit(0L)).as("qtd_planejada"))
      .withColumn("cvp_pct",
        when(col("qtd_planejada") === 0, lit(0.0))
          .otherwise(expr(
            """((qtd_produzida * 20000 + qtd_planejada)
               div (2 * qtd_planejada)) / 100.0""")))
    sku.fold(base)(k => base.filter(col("cod_produto") === k))
      .orderBy(col("cod_produto"))
  }

  // lazy: r16 is declared below this map (object-init order)
  lazy val defs: Map[String, Q] = Map(
    "r20_balanco_integridade" -> r20BalancoIntegridade,
    "r5_painel_sdr" -> r5PainelSdr("maio", 1997),
    "r6_sla_producao" -> r6SlaProducao,
    "r1_cenario_faturamento" -> r1CenarioFaturamento,
    "r2_recorrencia_base" -> r2RecorrenciaBase,
    "r3_recorrencia_alertas" -> r3RecorrenciaAlertas,
    "r4_inadimplencia_base" -> r4InadimplenciaBase,
    "r16_cenario_yty" -> r16CenarioYty,
    "r21_cvp_sku" -> r21CvpSku(None))

  /** R16: `Cenario_YearToYear()` shape-exact
    * (`scripts_sql/Cenario_YearToYear.sql`): four-year revenue pivot
    * by conditional sums (A4), de_DE money/percent display strings
    * (CONCAT('R$ ', FORMAT(x, 2, 'de_DE')) — the BRL format), 'N/A'
    * zero-denominator growth guards, inline business-days dimension
    * (U4/S15) left-joined for the last year's revenue-per-business-day
    * ('ROB D.U'), scalar-subquery total days on the UNION'd
    * 'TOTAL GERAL/MÉDIA' row (Mes_Num 13), ordered Mes_Num.
    * Years 2023..2026 play as 1997..2000; growth percents and ROB are
    * computed from exact integer cents (half-up away from zero) for
    * engine-stable formatting (see r5 note). Aliases: `2023`→`1997` …,
    * 'Cresc% 24/23'→cresc_98_97 …, 'ROB D.U 26'→rob_du_2000. */
  val r16CenarioYty: Q = (s, d) => {
    import s.implicits._
    val years = Seq(1997, 1998, 1999, 2000)
    val duRows = Seq((1, 22), (2, 20), (3, 21), (4, 21), (5, 21), (6, 21),
      (7, 23), (8, 21), (9, 21), (10, 22), (11, 20), (12, 22))
    val mesesCap = monthsPt.map(m => s"${m.head}${m.tail.toLowerCase}")
    def crescStr(a: String, b: String): Column = {
      val cp = s"((ABS($a - $b) * 20000 + $b) div (2 * $b))"
      when(col(b) === 0, lit("N/A")).otherwise(concat(
        when(col(a) < col(b), "-").otherwise(""),
        translate(format_number(expr(s"$cp div 100").cast("long"), 0), ",", "."),
        lit(","), lpad(expr(s"$cp % 100").cast("string"), 2, "0"), lit("%")))
    }
    def display(df: DataFrame): DataFrame = {
      val withCents = years.foldLeft(df)((acc, y) =>
        acc.withColumn(s"c$y", (col(s"f$y") * 100).cast("long")))
      withCents.select(
        col("mes"), col("mes_num"),
        formatBrl(col("f1997")).as("1997"),
        formatBrl(col("f1998")).as("1998"),
        formatBrl(col("f1999")).as("1999"),
        formatBrl(col("f2000")).as("2000"),
        crescStr("c1998", "c1997").as("cresc_98_97"),
        crescStr("c1999", "c1998").as("cresc_99_98"),
        crescStr("c2000", "c1999").as("cresc_00_99"),
        formatBrl(coalesce(
          expr("((c2000 * 2 + du) div (2 * du)) / 100.0"), lit(0.0)))
          .as("rob_du_2000"))
    }
    val fAggs = years.map(y =>
      sum(when(year(col("o_orderdate")) === y, dec2(col("o_totalprice")))
        .otherwise(lit(0).cast("decimal(18,2)"))).as(s"f$y"))
    val detalhe = Tables.orders(s, d)
      .groupBy(month(col("o_orderdate")).as("mes_num"))
      .agg(fAggs.head, fAggs.tail: _*)
    val du = duRows.toDF("du_mes", "du")
    val detail = display(detalhe
      .join(broadcast(du), col("mes_num") === col("du_mes"), "left")
      .withColumn("mes",
        element_at(array(mesesCap.map(lit): _*), col("mes_num"))))
    val totalAggs = years.map(y => sum(col(s"f$y")).as(s"f$y"))
    val total = display(detalhe
      .agg(totalAggs.head, totalAggs.tail: _*)
      .withColumn("mes", lit("TOTAL GERAL/MÉDIA"))
      .withColumn("mes_num", lit(13))
      .withColumn("du", lit(duRows.map(_._2).sum)))
    detail.unionByName(total).orderBy(col("mes_num"))
  }

  private val brlFmtSql: String => String = expr =>
    s"""'R$$ ' || translate(format('{:,}', CAST(FLOOR(CAST($expr AS DECIMAL(18,2))) AS BIGINT)), ',', '.')
       || ',' || lpad(CAST(CAST((CAST($expr AS DECIMAL(18,2)) - FLOOR(CAST($expr AS DECIMAL(18,2)))) * 100 AS BIGINT) AS VARCHAR), 2, '0')"""

  private val r2BaseSql = s"""
      WITH per_customer AS (
        SELECT c_mktsegment AS vendedor, c_custkey, COUNT(*) AS n
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE YEAR(o_orderdate) = 1997
          AND c_mktsegment NOT IN ('<SEM VENDEDOR>')
        GROUP BY 1, 2),
      grouped AS (
        SELECT vendedor,
          CASE WHEN n = 1 THEN '0' WHEN n = 2 THEN '1'
               WHEN n = 3 THEN '2' ELSE '>=3' END AS g
        FROM per_customer),
      cte AS (
        SELECT vendedor,
          CAST(SUM(CASE WHEN g = '0' THEN 1 ELSE 0 END) AS BIGINT) AS c_0,
          CAST(SUM(CASE WHEN g = '1' THEN 1 ELSE 0 END) AS BIGINT) AS c_1,
          CAST(SUM(CASE WHEN g = '2' THEN 1 ELSE 0 END) AS BIGINT) AS c_2,
          CAST(SUM(CASE WHEN g = '>=3' THEN 1 ELSE 0 END) AS BIGINT) AS c_3_mais
        FROM grouped GROUP BY vendedor),
      unioned AS (
        SELECT vendedor,
          c_0 + c_1 + c_2 + c_3_mais AS Total_Base,
          c_1 + c_2 + c_3_mais AS Recorrentes,
          0 AS linha_total
        FROM cte
        UNION ALL
        SELECT '--- TOTAL DA EQUIPE ---',
          CAST(SUM(c_0 + c_1 + c_2 + c_3_mais) AS BIGINT),
          CAST(SUM(c_1 + c_2 + c_3_mais) AS BIGINT), 1
        FROM cte)
      SELECT vendedor, Recorrentes, Total_Base,
        CAST(ROUND(perc * 100, 2) AS VARCHAR) || '%' AS Recorrencia,
        perc AS perc_ordenacao, linha_total
      FROM (SELECT *, CAST(Recorrentes AS DOUBLE) / NULLIF(Total_Base, 0) AS perc
            FROM unioned)"""

  private def crescDeSql(a: String, b: String): String = {
    val cp = s"((ABS($a - $b) * 20000 + $b) // (2 * $b))"
    s"""CASE WHEN $b = 0 THEN 'N/A'
       ELSE (CASE WHEN $a < $b THEN '-' ELSE '' END)
         || translate(format('{:,}', $cp // 100), ',', '.')
         || ',' || lpad(CAST($cp % 100 AS VARCHAR), 2, '0') || '%'
       END"""
  }

  private val r16Sql: String = {
    val mesCase = monthsPt.zipWithIndex
      .map { case (m, i) =>
        s"WHEN ${i + 1} THEN '${m.head}${m.tail.toLowerCase}'" }
      .mkString("CASE mes_num ", " ", " END")
    def fSum(y: Int) =
      s"""SUM(CASE WHEN YEAR(o_orderdate) = $y
          THEN CAST(o_totalprice AS DECIMAL(18,2))
          ELSE CAST(0 AS DECIMAL(18,2)) END) AS f$y"""
    s"""
      WITH dias_uteis AS (
        SELECT * FROM (VALUES (1,22),(2,20),(3,21),(4,21),(5,21),(6,21),
          (7,23),(8,21),(9,21),(10,22),(11,20),(12,22)) AS t(du_mes, du)),
      detalhe AS (
        SELECT MONTH(o_orderdate) AS mes_num,
          ${fSum(1997)}, ${fSum(1998)}, ${fSum(1999)}, ${fSum(2000)}
        FROM orders GROUP BY 1),
      unioned AS (
        SELECT $mesCase AS mes, mes_num, f1997, f1998, f1999, f2000, du
        FROM detalhe LEFT JOIN dias_uteis ON mes_num = du_mes
        UNION ALL
        SELECT 'TOTAL GERAL/MÉDIA', 13, SUM(f1997), SUM(f1998),
          SUM(f1999), SUM(f2000), (SELECT SUM(du) FROM dias_uteis)
        FROM detalhe),
      cents AS (
        SELECT *, CAST(f1997 * 100 AS BIGINT) AS c1997,
          CAST(f1998 * 100 AS BIGINT) AS c1998,
          CAST(f1999 * 100 AS BIGINT) AS c1999,
          CAST(f2000 * 100 AS BIGINT) AS c2000
        FROM unioned)
      SELECT mes, mes_num,
        ${brlFmtSql("f1997")} AS "1997", ${brlFmtSql("f1998")} AS "1998",
        ${brlFmtSql("f1999")} AS "1999", ${brlFmtSql("f2000")} AS "2000",
        ${crescDeSql("c1998", "c1997")} AS cresc_98_97,
        ${crescDeSql("c1999", "c1998")} AS cresc_99_98,
        ${crescDeSql("c2000", "c1999")} AS cresc_00_99,
        ${brlFmtSql("COALESCE(((c2000 * 2 + du) // (2 * du)) / 100.0, 0.0)")}
          AS rob_du_2000
      FROM cents ORDER BY mes_num"""
  }

  val oracles: Map[String, String] = Map(
    "r21_cvp_sku" -> """
      WITH planejado AS (
        SELECT l_partkey, CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT)
          AS qtd_planejada
        FROM lineitem GROUP BY l_partkey),
      produzido AS (
        SELECT l_partkey, CAST(SUM(CAST(l_quantity AS INT)) AS BIGINT)
          AS qtd_produzida
        FROM lineitem WHERE l_shipdate < '1997-01-01' GROUP BY l_partkey),
      base AS (
        SELECT p_partkey AS cod_produto, p_name AS descricao,
          p_brand AS marca,
          COALESCE(prd.qtd_produzida, 0) AS qtd_produzida,
          COALESCE(pln.qtd_planejada, 0) AS qtd_planejada
        FROM part
        LEFT JOIN produzido prd ON p_partkey = prd.l_partkey
        LEFT JOIN planejado pln ON p_partkey = pln.l_partkey)
      SELECT cod_produto, descricao, marca, qtd_produzida, qtd_planejada,
        CASE WHEN qtd_planejada = 0 THEN 0.0
          ELSE ((qtd_produzida * 20000 + qtd_planejada)
                // (2 * qtd_planejada)) / 100.0 END AS cvp_pct
      FROM base ORDER BY cod_produto""",
    "r20_balanco_integridade" -> s"""
      WITH base AS (
        SELECT CAST(l_extendedprice AS DECIMAL(15,2)) AS valor_num,
          s_name AS nome_empresa,
          CASE WHEN l_returnflag = 'A' THEN 'ATIVO'
               WHEN l_returnflag = 'R' THEN 'PASSIVO'
               ELSE 'OUTRO' END AS tipo
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-02-01'),
      agg AS (
        SELECT COALESCE(nome_empresa, 'TOTAL DO GRUPO') AS empresa,
          CAST(GROUPING(nome_empresa) AS INT) AS linha_total,
          SUM(CASE WHEN tipo = 'ATIVO' THEN valor_num
                   ELSE CAST(0 AS DECIMAL(15,2)) END) AS ta,
          SUM(CASE WHEN tipo = 'PASSIVO' THEN valor_num
                   ELSE CAST(0 AS DECIMAL(15,2)) END) AS tp
        FROM base GROUP BY ROLLUP (nome_empresa))
      SELECT empresa, linha_total,
        ${brlFmtSql("ta")} AS total_ativo_fmt,
        ${brlFmtSql("tp")} AS total_passivo_fmt,
        CAST(ROUND(ta + tp, 2) AS DOUBLE) AS check_integridade,
        CASE WHEN ABS(ta + tp) < 0.01 THEN 'ÍNTEGRO'
             ELSE 'INCONSISTENTE' END AS status
      FROM agg ORDER BY linha_total, empresa""",
    "r16_cenario_yty" -> r16Sql,
    "r6_sla_producao" -> """
      WITH expedicao_max AS (
        SELECT l_orderkey AS ok_exp, MAX(l_shipdate) AS ultima_expedicao
        FROM lineitem GROUP BY l_orderkey),
      base AS (
        SELECT l_orderkey AS ordem, l_linenumber AS item, p_brand AS marca,
          CAST(o_orderdate AS DATE) + 2 AS prazo_sla,
          CAST(date_diff('second', o_orderdate, l_shipdate) AS BIGINT) AS segundos,
          date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
            AS lt_dias,
          CAST(l_shipdate AS DATE) AS ship_date,
          CAST(ultima_expedicao AS DATE) AS ultima_expedicao,
          o_orderstatus
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        LEFT JOIN expedicao_max ON l_orderkey = ok_exp)
      SELECT ordem, item, marca, prazo_sla,
        printf('%02d:%02d:%02d', segundos // 3600, (segundos % 3600) // 60,
          segundos % 60) AS lt_hms,
        CAST(lt_dias AS INT) AS lt_dias,
        CASE WHEN ship_date <= prazo_sla THEN 'NO PRAZO' ELSE 'ATRASADO' END
          AS status_sla,
        ultima_expedicao,
        CASE WHEN o_orderstatus = 'F' THEN 'LEGADO' ELSE 'SERIAL' END AS origem
      FROM base
      ORDER BY ordem, item""",
    "r5_painel_sdr" -> s"""
      WITH co AS (
        SELECT c_mktsegment AS sdr, c_custkey, o_orderkey, o_orderdate,
          CAST(o_totalprice AS DECIMAL(18,2)) AS valor
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE c_mktsegment NOT IN ('<SEM SDR>')),
      scc AS (
        SELECT sdr AS sdr_c, COUNT(DISTINCT c_custkey) AS qtd_cadastros
        FROM co WHERE YEAR(o_orderdate) = 1997 AND MONTH(o_orderdate) = 5
        GROUP BY sdr),
      first_order AS (
        SELECT sdr, o_orderdate AS primeira_data, o_orderkey AS primeiro_pedido,
          valor AS valor_primeiro
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY sdr, c_custkey
                ORDER BY o_orderdate, o_orderkey) AS rn FROM co)
        WHERE rn = 1),
      spp AS (
        SELECT sdr AS sdr_p, COUNT(*) AS prim_pedido_num,
          ((CAST(SUM(valor_primeiro) * 100 AS BIGINT) * 2
            + COUNT(DISTINCT primeiro_pedido))
            // (2 * COUNT(DISTINCT primeiro_pedido))) / 100.0 AS valor_medio
        FROM first_order
        WHERE YEAR(primeira_data) = 1997 AND MONTH(primeira_data) = 5
        GROUP BY sdr),
      msdr AS (SELECT * FROM (VALUES ('AUTOMOBILE', 25), ('BUILDING', 25),
        ('FURNITURE', 20), ('HOUSEHOLD', 22), ('MACHINERY', 25))
        AS m(sdr_m, meta_nv_loja)),
      merged AS (
        SELECT 1997 AS Ano, 'maio' AS Mes,
          COALESCE(sdr_c, sdr_p, sdr_m) AS NomeSDR,
          CAST(COALESCE(meta_nv_loja, 0) AS VARCHAR) AS MetaPedidos,
          CAST(COALESCE(qtd_cadastros, 0) AS BIGINT) AS QtdCadastros,
          CAST(COALESCE(prim_pedido_num, 0) AS BIGINT) AS PriPedido,
          COALESCE(valor_medio, 0.0) AS valor_medio,
          COALESCE(CAST(prim_pedido_num AS DOUBLE)
            / NULLIF(qtd_cadastros, 0) * 100, 0.0) AS conv
        FROM scc
        LEFT JOIN spp ON sdr_c = sdr_p
        LEFT JOIN msdr ON COALESCE(sdr_c, sdr_p) = sdr_m),
      premiado AS (
        SELECT *, CASE
            WHEN PriPedido BETWEEN 0 AND 2 THEN 0.0
            WHEN PriPedido BETWEEN 3 AND 7 THEN PriPedido * 80.0
            WHEN PriPedido BETWEEN 8 AND 11 THEN PriPedido * 110.0
            WHEN PriPedido BETWEEN 12 AND 14 THEN PriPedido * 130.0
            WHEN PriPedido >= 15 THEN PriPedido * 140.0
            ELSE 0.0 END AS premio
        FROM merged)
      SELECT Ano, Mes, NomeSDR, MetaPedidos, QtdCadastros, PriPedido,
        ${brlFmtSql("valor_medio")} AS VLMReal,
        printf('%.2f%%', conv) AS pct_conversao,
        ${brlFmtSql("premio")} AS Premio,
        ${brlFmtSql("premio + 2290.0")} AS PremioMaisSalario
      FROM premiado
      ORDER BY NomeSDR""",
    "r1_cenario_faturamento" -> s"""
      WITH inner_agg AS (
        SELECT c_mktsegment AS vendedor,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS faturado_dec,
          COUNT(*) AS itens,
          COUNT(DISTINCT c_custkey) AS conversao,
          GREATEST(CAST(700000000.0 AS DECIMAL(18,2))
            - SUM(CAST(o_totalprice AS DECIMAL(18,2))),
            CAST(0 AS DECIMAL(18,2))) AS gap_para_soma
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_mktsegment),
      rolled AS (
        SELECT CAST(GROUPING(vendedor) AS INT) AS g, vendedor,
          SUM(faturado_dec) AS fat_dec,
          CAST(SUM(itens) AS BIGINT) AS itens,
          CAST(SUM(conversao) AS BIGINT) AS conversao,
          SUM(gap_para_soma) AS gap_dec,
          COUNT(*) AS n_vendedores
        FROM inner_agg
        GROUP BY ROLLUP (vendedor)),
      enriched AS (
        SELECT g, vendedor, itens, conversao, gap_dec,
          CAST(fat_dec AS DOUBLE) AS faturado,
          CASE WHEN g = 1 THEN 700000000.0 * n_vendedores
               ELSE 700000000.0 END AS meta_apropriada,
          CASE WHEN conversao = 0 THEN NULL
            ELSE ((CAST(fat_dec * 100 AS BIGINT) * 2 + conversao)
                  // (2 * conversao)) / 100.0 END AS vlm_valor
        FROM rolled)
      SELECT COALESCE(vendedor, 'Total Geral') AS vendedor,
        ${brlFmtSql("meta_apropriada")} AS meta_vendedor,
        ${brlFmtSql("faturado")} AS faturado_fmt,
        faturado,
        ${brlFmtSql("CAST(gap_dec AS DOUBLE)")} AS gap_fmt,
        itens, conversao,
        CASE WHEN conversao = 0 THEN NULL
          ELSE ${brlFmtSql("vlm_valor")} END AS vlm,
        printf('%.2f%%', faturado / meta_apropriada * 100) AS atingimento_str,
        CASE WHEN faturado / meta_apropriada * 100 > 100 THEN 'BATEU META'
          ELSE 'FORA DA META' END AS status_meta,
        g
      FROM enriched
      ORDER BY g ASC, faturado DESC""",
    "r2_recorrencia_base" -> s"""
      SELECT vendedor, Recorrentes, Total_Base, Recorrencia,
        perc_ordenacao, linha_total
      FROM ($r2BaseSql)
      ORDER BY linha_total ASC, perc_ordenacao DESC""",
    "r3_recorrencia_alertas" -> s"""
      SELECT vendedor, Recorrentes, Total_Base, Recorrencia,
        CASE
          WHEN CAST(REPLACE(Recorrencia, '%', '') AS DECIMAL(10,2)) < 40.00
            THEN 'CRÍTICO'
          WHEN CAST(REPLACE(Recorrencia, '%', '') AS DECIMAL(10,2)) <= 47.00
            THEN 'ATENÇÃO'
          ELSE 'NORMAL'
        END AS Status_Fidelizacao
      FROM ($r2BaseSql)
      ORDER BY linha_total, perc_ordenacao DESC""",
    "r4_inadimplencia_base" -> s"""
      WITH base AS (
        SELECT c_mktsegment AS vendedor, c_custkey, o_orderstatus,
          o_totalprice, o_orderdate,
          date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
            AS atraso
        FROM customer JOIN orders ON c_custkey = o_custkey
        WHERE c_mktsegment NOT IN ('<SEM VENDEDOR>')),
      cte_ativos AS (
        SELECT vendedor, COUNT(DISTINCT c_custkey) AS ativos_num
        FROM base WHERE YEAR(o_orderdate) = 1997 GROUP BY vendedor),
      cte_inad AS (
        SELECT vendedor,
          SUM(CASE WHEN o_orderstatus = 'O' AND atraso BETWEEN 100 AND 500
            THEN CAST(o_totalprice AS DECIMAL(18,2))
            ELSE CAST(0 AS DECIMAL(18,2)) END) AS valor_dec,
          CAST(SUM(CASE WHEN o_orderstatus = 'O' AND atraso BETWEEN 100 AND 500
            THEN 1 ELSE 0 END) AS BIGINT) AS qtd_num,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS limite_dec
        FROM base GROUP BY vendedor),
      joined AS (
        SELECT i.vendedor, COALESCE(a.ativos_num, 0) AS Ativos,
          i.qtd_num AS QTD, i.valor_dec, i.limite_dec
        FROM cte_inad i LEFT JOIN cte_ativos a ON i.vendedor = a.vendedor),
      unioned AS (
        SELECT vendedor, Ativos, QTD, valor_dec, limite_dec, 0 AS linha_total
        FROM joined
        UNION ALL
        SELECT '--- TOTAL DA EQUIPE ---', CAST(SUM(Ativos) AS BIGINT),
          CAST(SUM(QTD) AS BIGINT), SUM(valor_dec), SUM(limite_dec), 1
        FROM joined)
      SELECT vendedor, Ativos, QTD,
        ${brlFmtSql("CAST(valor_dec AS DOUBLE)")} AS Valor,
        CAST(ROUND(perc * 100, 2) AS VARCHAR) || '%' AS Inadimplencia,
        ${brlFmtSql("CAST(limite_dec AS DOUBLE)")} AS Limite_Credito,
        perc AS perc_ordenacao, linha_total
      FROM (SELECT *, CAST(QTD AS DOUBLE) / NULLIF(Ativos, 0) AS perc
            FROM unioned)
      ORDER BY linha_total ASC, perc_ordenacao DESC""")
}
