package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.{Det, Tables}
import graft.functions.BrFunctions._

/** SURVEY.md §2.8 scalar functions — string / date / math / conversion.
  *
  * The test tables are clean, so each query synthesizes the dirty
  * input the reference deals with (BRL money strings, broken
  * encodings, dd/MM/yyyy text dates) from a numeric/date column, then
  * applies the cleaning function — giving the oracle a full
  * dirty→clean roundtrip to check. All functions are pure Column
  * expressions (whole-stage codegen; no UDFs — SURVEY §2.12).
  */
object Scalars {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** F1+F14: BRL format → parse roundtrip
    * (`ETL - Faturamento B2B.py:86-110`, `ETL - Cadastro SR.py:17-19`).
    * Keeps the display string AND the numeric twin (§7.4 risk 2). */
  val f1BrlRoundtrip: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        formatBrl(col("o_totalprice")).as("valor_brl"),
        parseBrlMoney(formatBrl(col("o_totalprice"))).cast("double").as("valor_num"))
      .orderBy(col("o_orderkey"))

  /** F2: integer cleanse — strip non-digits → nullable long
    * (`ETL - Venda B2B.py:58-77`). */
  val f2DigitCleanse: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        cleanDigitsLong(concat(lit("PED-"), col("o_orderkey"), lit("/X")))
          .as("pedido_limpo"))
      .orderBy(col("o_orderkey"))

  /** F3: digit extraction preserving leading zeros (CNPJ/CPF/CEP,
    * `ETL - CRM.py:41-53`). */
  val f3DigitExtract: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        cleanDigitsStr(concat(lit("(0"), lpad(col("c_custkey").cast("string"), 8, "0"),
          lit(") ramal"))).as("fone_limpo"))
      .orderBy(col("c_custkey"))

  /** F4: CNPJ mod-11 check-digit validation (`cnpj_core.py:18-39`) over
    * synthesized 14-digit strings (~1/121 of random strings validate). */
  val f4CnpjValidate: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        lpad((col("c_custkey") * 987654321L % 99999999999999L).cast("string"), 14, "0")
          .as("cnpj"))
      .withColumn("valido", isValidCnpj(col("cnpj")))
      .orderBy(col("c_custkey"))

  /** F5: CNPJ display format `NN.NNN.NNN/NNNN-NN` (`cnpj_core.py:42-46`). */
  val f5CnpjFormat: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        formatCnpj(lpad(col("c_custkey").cast("string"), 14, "0")).as("cnpj_fmt"))
      .orderBy(col("c_custkey"))

  /** F6: trim+upper normalization (`ETL - CRM.py:35-38`). */
  val f6Normalize: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        normalizeText(concat(lit("  "), col("c_name"), lit("   "))).as("nome_norm"))
      .orderBy(col("c_custkey"))

  /** F7: null-propagating composite CITY|UF key (`ETL - CRM.py:55-60`). */
  val f7CompositeKey: Q = (s, d) =>
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("n_nationkey"),
        cityUfKey(col("n_name"), col("r_name")).as("chave"),
        cityUfKey(col("n_name"), lit(null)).as("chave_nula"))
      .orderBy(col("n_nationkey"))

  /** F8: split "city - UF" + ambiguity disambiguation
    * (`API Extrator Renda Per Capita - IBGE.py:168-193`): suffix the
    * region only when the nation-name is ambiguous across regions. */
  val f8SplitDisambiguate: Q = (s, d) => {
    val base = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(concat(col("n_name"), lit(" - "), col("r_name")).as("rotulo"))
    val parts = base
      .withColumn("cidade", trim(split(col("rotulo"), " - ").getItem(0)))
      .withColumn("uf", trim(split(col("rotulo"), " - ").getItem(1)))
    val ambiguity = parts.groupBy(col("cidade").as("cid"))
      .agg(countDistinct(col("uf")).as("n_ufs"))
    parts.join(broadcast(ambiguity), col("cidade") === col("cid"))
      .select(col("cidade"), col("uf"),
        when(col("n_ufs") > 1, concat(col("cidade"), lit(" ("), col("uf"), lit(")")))
          .otherwise(col("cidade")).as("cidade_unica"))
      .orderBy(col("cidade"), col("uf"))
  }

  /** F9: mojibake repair — regex library of broken-accent patterns
    * (`Conversor de Formatos.py:73-136`). */
  /** Mojibake pairs derived mechanically: correct pt-BR char, UTF-8
    * encoded then wrongly decoded as cp1252 — the exact corruption the
    * reference repairs. Derived (not literal) to keep the source free
    * of fragile mojibake bytes. */
  private[queries] val mojibakePairs: Seq[(String, String)] =
    ("\u00c9\u00c7\u00c3\u00d5\u00d3\u00da\u00ca" +        // É Ç Ã Õ Ó Ú Ê
     "\u00e7\u00e1\u00e9\u00ed\u00f3\u00fa\u00ea\u00f4" + // ç á é í ó ú ê ô
     "\u00c1\u00cd").map { ch =>                            // Á Í
      new String(ch.toString.getBytes("UTF-8"), "windows-1252") -> ch.toString
    }

  private[queries] val goodSuffix = " S\u00c3O PAULO CAF\u00c9 A\u00c7\u00c3O"
  private[queries] val brokenSuffix =
    new String(goodSuffix.getBytes("UTF-8"), "windows-1252")

  val f9MojibakeRepair: Q = (s, d) => {
    val broken = concat(col("n_name"), lit(brokenSuffix))
    val repaired = mojibakePairs.foldLeft(broken) { case (c, (bad, good)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(bad), good)
    }
    Tables.nation(s, d)
      .select(col("n_nationkey"), repaired.as("texto_reparado"))
      .orderBy(col("n_nationkey"))
  }

  /** F9b: byte-level encoding repair — the strict
    * `encode(cp1252) → decode(utf-8)` round-trip UDF
    * ([[graft.functions.EncodingRepair]], `Conversor de
    * Formatos.py:105-136`). Two probes per row: a corrupted column
    * (must come back accent-perfect) and an already-clean column
    * (must pass through the identity leg untouched). */
  val f9bEncodingRepair: Q = (s, d) => {
    val broken = concat(col("n_name"), lit(brokenSuffix))
    val clean = concat(col("n_name"), lit(goodSuffix))
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        graft.functions.EncodingRepair.repair(broken).as("texto_reparado"),
        graft.functions.EncodingRepair.repair(clean).as("texto_ja_limpo"))
      .orderBy(col("n_nationkey"))
  }

  /** F10: substring classification ladder
    * (`CTE - Check de Integridade….sql:6-10`). */
  val f10SubstringClassify: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        classifyContains(col("p_type"),
          Seq("ECO" -> "ECONOMICO", "PROMO" -> "PROMOCIONAL", "LARGE" -> "GRANDE"),
          "PADRAO").as("classe"))
      .orderBy(col("p_partkey"))

  /** F11: value remap / label override (`SMT_Top10_Acoes.sql:20-24`). */
  val f11ValueRemap: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", "FECHADO")
          .when(col("o_orderstatus") === "O", "ABERTO")
          .otherwise("PENDENTE").as("status_pt"))
      .orderBy(col("o_orderkey"))

  /** F12: Sim/Não → 0/1 normalize (`ETL - Painel de
    * Oportunidades.py:174-209`): synthesizes the messy inputs. */
  val f12SimNao: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") === "F", "Sim")
          .when(col("o_orderstatus") === "O", " não ")
          .otherwise("1").as("flag_bruto"))
      .withColumn("flag", simNaoToInt(col("flag_bruto")))
      .orderBy(col("o_orderkey"))

  /** F13: percent-string parse (`vw_inadimplencia_alertas.sql:10-11`). */
  val f13PercentParse: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        format_string("%.2f%%", col("l_discount") * 100).as("pct_str"))
      .withColumn("pct", percentParse(col("pct_str")).cast("double"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** F15: pt-BR month name ↔ number roundtrip, locale-independent
    * (`Algoritmo de Estruturação de Dados.py:346-383`). */
  val f15MonthNames: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        monthNamePt(month(col("o_orderdate"))).as("mes_nome"))
      .withColumn("mes_n", monthNumberPt(col("mes_nome")))
      .orderBy(col("o_orderkey"))

  /** F16: day-first date parse with coercion to null
    * (`ETL - Faturamento B2B.py:167-171`): every 10th row is garbage. */
  val f16DateParse: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 10 === 0, lit("not a date"))
          .otherwise(date_format(col("o_orderdate"), "dd/MM/yyyy")).as("data_str"))
      .withColumn("data", try_to_date(col("data_str"), "dd/MM/yyyy"))
      .orderBy(col("o_orderkey"))

  /** F17: date part extraction (`Algoritmo…Dados.py:387-390`). */
  val f17DateParts: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("ano"),
        month(col("o_orderdate")).as("mes"),
        dayofmonth(col("o_orderdate")).as("dia"),
        (weekday(col("o_orderdate")) + 1).as("dia_semana_iso"),
        dayofyear(col("o_orderdate")).as("dia_ano"),
        weekofyear(col("o_orderdate")).as("semana_iso"))
      .orderBy(col("o_orderkey"))

  /** F18: week-of-month label (`Algoritmo…Dados.py:288-306`). */
  val f18WeekOfMonth: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        weekOfMonthLabel(col("o_orderdate")).as("semana_mes"))
      .orderBy(col("o_orderkey"))

  /** F19: quarter label (`Algoritmo…Dados.py:399-400`). */
  val f19QuarterLabel: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), quarterLabel(col("o_orderdate")).as("trimestre"))
      .orderBy(col("o_orderkey"))

  /** F20: date diff in days vs an injected clock (`ETL - CRM.py:112-113`;
    * fixed reference date, not current_date — SURVEY §7.4 risk 8). */
  val f20DateDiff: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate")))
          .as("dias_desde_pedido"))
      .orderBy(col("o_orderkey"))

  /** F21: seconds → HH:MM:SS lead time (`SLA…Completo.sql:158-161`):
    * order-to-last-ship lead time per order. */
  val f21LeadTimeHms: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(max(col("l_shipdate")).as("ultimo_embarque"))
    Tables.orders(s, d)
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"),
        leadTimeHms(unix_timestamp(col("ultimo_embarque")) -
          unix_timestamp(col("o_orderdate"))).as("lead_time"))
      .orderBy(col("o_orderkey"))
  }

  /** F22: date add — SLA deadline (`SLA…Completo.sql:49`). */
  val f22DateAdd: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        date_add(to_date(col("o_orderdate")), 2).as("prazo_sla"))
      .orderBy(col("o_orderkey"))

  /** F23: month arithmetic with end-of-month clamping
    * (`EDA - Faturamento.py:72-73`, `Mix_Mensal_MM.sql:10`). */
  val f23AddMonths: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        add_months(to_date(col("o_orderdate")), 1).as("mes_seguinte"),
        add_months(to_date(col("o_orderdate")), -1).as("mes_anterior"))
      .orderBy(col("o_orderkey"))

  /** F24: calendar dim generation 2020→2021
    * (`Algoritmo de Estruturação de Dados.py:309-476`):
    * `sequence` + `explode`, fully distributed (no driver loop). */
  val f24Calendar: Q = (s, d) => {
    s.range(1)
      .select(explode(sequence(
        lit("2020-01-01").cast("date"),
        lit("2021-12-31").cast("date"),
        expr("interval 1 day"))).as("dia"))
      .select(col("dia"),
        year(col("dia")).as("ano"),
        month(col("dia")).as("mes"),
        monthNamePt(month(col("dia"))).as("mes_nome"),
        (weekday(col("dia")) + 1).as("dia_semana_iso"),
        (weekday(col("dia")) >= 5).as("fim_de_semana"),
        quarterLabel(col("dia")).as("trimestre"))
      .orderBy(col("dia"))
  }

  /** F25: business days per month from the generated calendar
    * (`Algoritmo…Dados.py:433-436`, `Cenario_YearToYear.sql:6-24`). */
  val f25BusinessDays: Q = (s, d) =>
    s.range(1)
      .select(explode(sequence(
        lit("2020-01-01").cast("date"),
        lit("2021-12-31").cast("date"),
        expr("interval 1 day"))).as("dia"))
      .groupBy(year(col("dia")).as("ano"), month(col("dia")).as("mes"))
      .agg(sum((weekday(col("dia")) < 5).cast("int")).as("dias_uteis"))
      .orderBy(col("ano"), col("mes"))

  /** F26: NULLIF-guarded safe division (`PROD_Produtividade_FPY.sql:25`). */
  val f26SafeDiv: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        safeDiv(dec2(col("o_totalprice")).cast("double"),
          (col("o_orderkey") % 3).cast("double")).as("razao"))
      .orderBy(col("o_orderkey"))

  /** F27: decimal rounding (`SP_SMT_Scrap_SKU.sql:21-26`) — HALF_UP on
    * exact decimals (ties resolve identically in both engines). */
  val f27Round: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(dec2(col("l_extendedprice")), 1).cast("double").as("preco_r1"),
        round(dec2(col("l_extendedprice")), 0).cast("double").as("preco_r0"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** F28: median-based scale auto-correction, threshold-exact with the
    * reference (`Modelo de Previsão de Vendas.py:42-51`): median over
    * POSITIVE values; > 10M → ÷1000, < 1000 (and > 0) → ×1000, else
    * unchanged. Exact median for oracle parity; `percentile_approx` is
    * the 100 TB path. */
  val f28ScaleCorrect: Q = (s, d) => {
    val med = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .filter(col("o_totalprice") > 0)
      .groupBy(col("c_mktsegment"))
      .agg(median(col("o_totalprice")).cast("double").as("mediana"))
    med.select(col("c_mktsegment"), col("mediana"),
      when(col("mediana") > 10000000, col("mediana") / 1000)
        .when(col("mediana") < 1000 && col("mediana") > 0, col("mediana") * 1000)
        .otherwise(col("mediana")).as("mediana_corrigida"))
      .orderBy(col("c_mktsegment"))
  }

  /** F29: IFNULL/COALESCE defaults after outer join
    * (`SMT_Reparos_MoM.sql:36`). */
  val f29CoalesceDefaults: Q = (s, d) => {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey").as("ck"))
      .agg(dsum(col("o_totalprice")).as("total_urgente"))
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("ck"), "left")
      .select(col("c_custkey"),
        coalesce(col("total_urgente"), lit(0.0)).as("total_urgente"))
      .orderBy(col("c_custkey"))
  }

  val defs: Map[String, Q] = Map(
    "f1_brl_roundtrip" -> f1BrlRoundtrip,
    "f2_digit_cleanse" -> f2DigitCleanse,
    "f3_digit_extract" -> f3DigitExtract,
    "f4_cnpj_validate" -> f4CnpjValidate,
    "f5_cnpj_format" -> f5CnpjFormat,
    "f6_normalize" -> f6Normalize,
    "f7_composite_key" -> f7CompositeKey,
    "f8_split_disambiguate" -> f8SplitDisambiguate,
    "f9_mojibake_repair" -> f9MojibakeRepair,
    "f9b_encoding_repair" -> f9bEncodingRepair,
    "f10_substring_classify" -> f10SubstringClassify,
    "f11_value_remap" -> f11ValueRemap,
    "f12_simnao" -> f12SimNao,
    "f13_percent_parse" -> f13PercentParse,
    "f15_month_names" -> f15MonthNames,
    "f16_date_parse" -> f16DateParse,
    "f17_date_parts" -> f17DateParts,
    "f18_week_of_month" -> f18WeekOfMonth,
    "f19_quarter_label" -> f19QuarterLabel,
    "f20_date_diff" -> f20DateDiff,
    "f21_leadtime_hms" -> f21LeadTimeHms,
    "f22_date_add" -> f22DateAdd,
    "f23_add_months" -> f23AddMonths,
    "f24_calendar" -> f24Calendar,
    "f25_business_days" -> f25BusinessDays,
    "f26_safe_div" -> f26SafeDiv,
    "f27_round" -> f27Round,
    "f28_scale_correct" -> f28ScaleCorrect,
    "f29_coalesce_defaults" -> f29CoalesceDefaults)

  /** mod-11 DV expression in portable SQL over a 14-digit string col. */
  private def sqlCnpjDv(s: String, weights: Seq[Int]): String = {
    val terms = weights.zipWithIndex
      .map { case (w, i) => s"CAST(substring($s, ${i + 1}, 1) AS INT) * $w" }
      .mkString(" + ")
    s"(CASE WHEN ($terms) % 11 < 2 THEN 0 ELSE 11 - (($terms) % 11) END)"
  }

  private val monthCaseOf: String => String = c =>
    monthsPt.zipWithIndex
      .map { case (m, i) => s"WHEN ${i + 1} THEN '$m'" }
      .mkString(s"CASE MONTH($c) ", " ", " END")

  val oracles: Map[String, String] = Map(
    // DuckDB's fmt-format rejects thousand separators on non-integers,
    // so the BR grouping is rebuilt from the exact-decimal int/cent parts.
    "f1_brl_roundtrip" -> """
      SELECT o_orderkey,
        'R$ ' || translate(format('{:,}', CAST(FLOOR(d) AS BIGINT)), ',', '.')
          || ',' || lpad(CAST(CAST((d - FLOOR(d)) * 100 AS BIGINT) AS VARCHAR), 2, '0')
          AS valor_brl,
        CAST(d AS DOUBLE) AS valor_num
      FROM (SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS d FROM orders)
      ORDER BY o_orderkey""",
    "f2_digit_cleanse" -> """
      SELECT o_orderkey,
        CAST(regexp_replace('PED-' || o_orderkey || '/X', '[^0-9]', '', 'g') AS BIGINT)
          AS pedido_limpo
      FROM orders ORDER BY o_orderkey""",
    "f3_digit_extract" -> """
      SELECT c_custkey,
        regexp_replace('(0' || lpad(CAST(c_custkey AS VARCHAR), 8, '0') || ') ramal',
          '[^0-9]', '', 'g') AS fone_limpo
      FROM customer ORDER BY c_custkey""",
    "f4_cnpj_validate" -> s"""
      SELECT c_custkey, cnpj,
        (length(cnpj) = 14
         AND cnpj <> repeat(substring(cnpj, 1, 1), 14)
         AND CAST(substring(cnpj, 13, 1) AS INT) =
             ${sqlCnpjDv("cnpj", Seq(5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2))}
         AND CAST(substring(cnpj, 14, 1) AS INT) =
             ${sqlCnpjDv("cnpj", Seq(6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2))})
          AS valido
      FROM (SELECT c_custkey,
              lpad(CAST(c_custkey * 987654321 % 99999999999999 AS VARCHAR), 14, '0')
                AS cnpj
            FROM customer)
      ORDER BY c_custkey""",
    "f5_cnpj_format" -> """
      SELECT c_custkey,
        substring(d, 1, 2) || '.' || substring(d, 3, 3) || '.' ||
        substring(d, 6, 3) || '/' || substring(d, 9, 4) || '-' ||
        substring(d, 13, 2) AS cnpj_fmt
      FROM (SELECT c_custkey, lpad(CAST(c_custkey AS VARCHAR), 14, '0') AS d
            FROM customer)
      ORDER BY c_custkey""",
    "f6_normalize" -> """
      SELECT c_custkey, UPPER(TRIM('  ' || c_name || '   ')) AS nome_norm
      FROM customer ORDER BY c_custkey""",
    "f7_composite_key" -> """
      SELECT n_nationkey,
        CASE WHEN n_name IS NULL OR r_name IS NULL THEN NULL
             ELSE UPPER(TRIM(n_name)) || '|' || UPPER(TRIM(r_name)) END AS chave,
        CAST(NULL AS VARCHAR) AS chave_nula
      FROM nation
      LEFT JOIN region ON n_regionkey = r_regionkey
      ORDER BY n_nationkey""",
    "f8_split_disambiguate" -> """
      WITH parts AS (
        SELECT TRIM(str_split(n_name || ' - ' || r_name, ' - ')[1]) AS cidade,
          TRIM(str_split(n_name || ' - ' || r_name, ' - ')[2]) AS uf
        FROM nation JOIN region ON n_regionkey = r_regionkey),
      amb AS (SELECT cidade AS cid, COUNT(DISTINCT uf) AS n_ufs
              FROM parts GROUP BY cidade)
      SELECT cidade, uf,
        CASE WHEN n_ufs > 1 THEN cidade || ' (' || uf || ')' ELSE cidade END
          AS cidade_unica
      FROM parts JOIN amb ON cidade = cid
      ORDER BY cidade, uf""",
    "f9_mojibake_repair" -> {
      val rep = mojibakePairs.foldLeft(s"n_name || '$brokenSuffix'") {
        case (expr, (bad, good)) => s"replace($expr, '$bad', '$good')"
      }
      s"SELECT n_nationkey, $rep AS texto_reparado FROM nation ORDER BY n_nationkey"
    },
    // The oracle states the REPAIRED truth directly: the corrupted
    // input is n_name + brokenSuffix (same construction as the Spark
    // side), so a correct byte round-trip must land exactly on
    // n_name + goodSuffix; the clean column must be untouched.
    "f9b_encoding_repair" -> s"""
      SELECT n_nationkey,
        n_name || '$goodSuffix' AS texto_reparado,
        n_name || '$goodSuffix' AS texto_ja_limpo
      FROM nation ORDER BY n_nationkey""",

    "f10_substring_classify" -> """
      SELECT p_partkey,
        CASE WHEN contains(UPPER(TRIM(p_type)), 'ECO') THEN 'ECONOMICO'
             WHEN contains(UPPER(TRIM(p_type)), 'PROMO') THEN 'PROMOCIONAL'
             WHEN contains(UPPER(TRIM(p_type)), 'LARGE') THEN 'GRANDE'
             ELSE 'PADRAO' END AS classe
      FROM part ORDER BY p_partkey""",
    "f11_value_remap" -> """
      SELECT o_orderkey,
        CASE o_orderstatus WHEN 'F' THEN 'FECHADO' WHEN 'O' THEN 'ABERTO'
          ELSE 'PENDENTE' END AS status_pt
      FROM orders ORDER BY o_orderkey""",
    "f12_simnao" -> """
      SELECT o_orderkey, flag_bruto,
        CASE WHEN flag_bruto IS NULL THEN 0
             WHEN UPPER(flag_bruto) IN ('SIM','TRUE','1') THEN 1
             WHEN UPPER(flag_bruto) IN ('NÃO','FALSE','0','') THEN 0
             ELSE CAST(TRUNC(COALESCE(TRY_CAST(UPPER(flag_bruto) AS DOUBLE), 0))
               AS INT) END AS flag
      FROM (SELECT o_orderkey,
              CASE o_orderstatus WHEN 'F' THEN 'Sim' WHEN 'O' THEN ' não '
                ELSE '1' END AS flag_bruto
            FROM orders)
      ORDER BY o_orderkey""",
    "f13_percent_parse" -> """
      SELECT l_orderkey, l_linenumber, pct_str,
        CAST(CAST(TRIM(replace(pct_str, '%', '')) AS DECIMAL(10,4)) AS DOUBLE) AS pct
      FROM (SELECT l_orderkey, l_linenumber,
              printf('%.2f%%', l_discount * 100) AS pct_str
            FROM lineitem)
      ORDER BY l_orderkey, l_linenumber""",
    "f15_month_names" -> s"""
      SELECT o_orderkey, ${monthCaseOf("o_orderdate")} AS mes_nome,
        CAST(MONTH(o_orderdate) AS INT) AS mes_n
      FROM orders ORDER BY o_orderkey""",
    "f16_date_parse" -> """
      SELECT o_orderkey, data_str,
        CAST(try_strptime(data_str, '%d/%m/%Y') AS DATE) AS data
      FROM (SELECT o_orderkey,
              CASE WHEN o_orderkey % 10 = 0 THEN 'not a date'
                ELSE strftime(o_orderdate, '%d/%m/%Y') END AS data_str
            FROM orders)
      ORDER BY o_orderkey""",
    "f17_date_parts" -> """
      SELECT o_orderkey,
        CAST(YEAR(o_orderdate) AS INT) AS ano,
        CAST(MONTH(o_orderdate) AS INT) AS mes,
        CAST(DAY(o_orderdate) AS INT) AS dia,
        CAST(ISODOW(o_orderdate) AS INT) AS dia_semana_iso,
        CAST(DAYOFYEAR(o_orderdate) AS INT) AS dia_ano,
        CAST(WEEKOFYEAR(o_orderdate) AS INT) AS semana_iso
      FROM orders ORDER BY o_orderkey""",
    "f18_week_of_month" -> """
      SELECT o_orderkey,
        'Semana ' || CAST(CASE WHEN DAY(o_orderdate) < fm THEN 0
          ELSE 1 + CAST(FLOOR((DAY(o_orderdate) - fm) / 7) AS INT) END AS VARCHAR)
          AS semana_mes
      FROM (SELECT o_orderkey, o_orderdate,
              (7 - (DAYOFWEEK(date_trunc('month', o_orderdate)) + 6) % 7) % 7 + 1
                AS fm
            FROM orders)
      ORDER BY o_orderkey""",
    "f19_quarter_label" -> """
      SELECT o_orderkey,
        CAST(QUARTER(o_orderdate) AS VARCHAR) || ' Trimestre ' ||
          CAST(YEAR(o_orderdate) AS VARCHAR) AS trimestre
      FROM orders ORDER BY o_orderkey""",
    "f20_date_diff" -> """
      SELECT o_orderkey,
        CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
          AS dias_desde_pedido
      FROM orders ORDER BY o_orderkey""",
    "f21_leadtime_hms" -> """
      SELECT o_orderkey,
        printf('%02d:%02d:%02d', secs // 3600, (secs % 3600) // 60, secs % 60)
          AS lead_time
      FROM (SELECT o_orderkey,
              CAST(date_diff('second', o_orderdate, ultimo_embarque) AS BIGINT) AS secs
            FROM orders
            JOIN (SELECT l_orderkey, MAX(l_shipdate) AS ultimo_embarque
                  FROM lineitem GROUP BY l_orderkey) li
              ON o_orderkey = l_orderkey)
      ORDER BY o_orderkey""",
    "f22_date_add" -> """
      SELECT o_orderkey, CAST(o_orderdate AS DATE) + 2 AS prazo_sla
      FROM orders ORDER BY o_orderkey""",
    "f23_add_months" -> """
      SELECT o_orderkey,
        CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS mes_seguinte,
        CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE) AS mes_anterior
      FROM orders ORDER BY o_orderkey""",
    "f24_calendar" -> s"""
      SELECT dia, CAST(YEAR(dia) AS INT) AS ano, CAST(MONTH(dia) AS INT) AS mes,
        ${monthCaseOf("dia")} AS mes_nome,
        CAST(ISODOW(dia) AS INT) AS dia_semana_iso,
        ISODOW(dia) >= 6 AS fim_de_semana,
        CAST(QUARTER(dia) AS VARCHAR) || ' Trimestre ' || CAST(YEAR(dia) AS VARCHAR)
          AS trimestre
      FROM (SELECT CAST(unnest(generate_series(DATE '2020-01-01', DATE '2021-12-31',
              INTERVAL 1 DAY)) AS DATE) AS dia)
      ORDER BY dia""",
    "f25_business_days" -> """
      SELECT CAST(YEAR(dia) AS INT) AS ano, CAST(MONTH(dia) AS INT) AS mes,
        CAST(SUM(CASE WHEN ISODOW(dia) <= 5 THEN 1 ELSE 0 END) AS BIGINT)
          AS dias_uteis
      FROM (SELECT CAST(unnest(generate_series(DATE '2020-01-01', DATE '2021-12-31',
              INTERVAL 1 DAY)) AS DATE) AS dia)
      GROUP BY 1, 2 ORDER BY ano, mes""",
    "f26_safe_div" -> """
      SELECT o_orderkey,
        CASE WHEN o_orderkey % 3 = 0 THEN NULL
             ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
                  / CAST(o_orderkey % 3 AS DOUBLE) END AS razao
      FROM orders ORDER BY o_orderkey""",
    "f27_round" -> """
      SELECT l_orderkey, l_linenumber,
        CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS preco_r1,
        CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 0) AS DOUBLE) AS preco_r0
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "f28_scale_correct" -> """
      SELECT c_mktsegment, mediana,
        CASE WHEN mediana > 10000000 THEN mediana / 1000
             WHEN mediana < 1000 AND mediana > 0 THEN mediana * 1000
             ELSE mediana END AS mediana_corrigida
      FROM (SELECT c_mktsegment,
              CAST(MEDIAN(o_totalprice) AS DOUBLE) AS mediana
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_totalprice > 0
            GROUP BY c_mktsegment)
      ORDER BY c_mktsegment""",
    "f29_coalesce_defaults" -> s"""
      SELECT c_custkey, COALESCE(total_urgente, 0.0) AS total_urgente
      FROM customer
      LEFT JOIN (SELECT o_custkey AS ck, ${sqlDsum("o_totalprice")} AS total_urgente
                 FROM orders WHERE o_orderpriority = '1-URGENT'
                 GROUP BY o_custkey) u
        ON c_custkey = ck
      ORDER BY c_custkey""")
}
