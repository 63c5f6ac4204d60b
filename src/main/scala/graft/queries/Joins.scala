package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}
import graft.functions.BrFunctions._

/** SURVEY.md §2.3 join operators.
  *
  * Scale notes: every dimension side (region/nation/customer/part/
  * literal dicts) is broadcast — explicitly hinted where the dim is
  * produced by a subquery AQE might misjudge. Fact-fact joins
  * (lineitem ⋈ orders) shuffle on the join key, which is the natural
  * co-partitioning for 100 TB (both sides hash on orderkey; with
  * bucketed tables this becomes a zero-shuffle join).
  */
object Joins {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** J1: left enrichment join on a composite normalized key
    * (`ETL - CRM.py:139-162`; key built `:55-60`). Nation|region plays
    * the CITY|UF composite role. */
  val j1LeftEnrich: Q = (s, d) => {
    val nat = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"), "left")
      .select(col("n_nationkey"),
        cityUfKey(col("n_name"), col("r_name")).as("chave_nacao_regiao"))
    Tables.customer(s, d)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"), "left")
      .select(col("c_custkey"), col("chave_nacao_regiao"))
      .orderBy(col("c_custkey"))
  }

  /** J2: lookup join (VLOOKUP/PROCX analog,
    * `Importador Automático de Dados.py:52-57`) — broadcast the matrix. */
  val j2Lookup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"), "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("p_brand"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** J3: full-outer join + coalesce merge of two aggregates
    * (`API Extrator Renda Per Capita - IBGE.py:139-147`,
    * `ETL - Cadastro SR.py:44-51`). */
  val j3OuterCoalesce: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    val open = orders.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("ck_o"))
      .agg(dsum(col("o_totalprice")).as("total_aberto"))
    val closed = orders.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("ck_f"))
      .agg(dsum(col("o_totalprice")).as("total_fechado"))
    open.join(closed, col("ck_o") === col("ck_f"), "full_outer")
      .select(
        coalesce(col("ck_o"), col("ck_f")).as("cliente"),
        coalesce(col("total_aberto"), lit(0.0)).as("total_aberto"),
        coalesce(col("total_fechado"), lit(0.0)).as("total_fechado"))
      .orderBy(col("cliente"))
  }

  /** J4: join on date key (fact ← daily FX-style series,
    * `PTAX - Conversor de Moedas BACEN.py:116-120`). */
  val j4DateJoin: Q = (s, d) => {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("dia"))
      .agg(dsum(col("o_totalprice")).as("total_pedidos"))
    val shipped = Tables.lineitem(s, d)
      .groupBy(to_date(col("l_shipdate")).as("dia_ship"))
      .agg(dsum(col("l_extendedprice")).as("total_embarcado"))
    daily.join(shipped, col("dia") === col("dia_ship"), "inner")
      .select(col("dia"), col("total_pedidos"), col("total_embarcado"))
      .orderBy(col("dia"))
  }

  /** J5: left join to an inline literal dim + fill 0
    * (`EDA - Faturamento.py:27-34,118`). */
  val j5StaticDim: Q = (s, d) => {
    import s.implicits._
    val macroRegion = Seq(
      ("AMERICA", "OCIDENTE"), ("EUROPE", "OCIDENTE"),
      ("ASIA", "ORIENTE"), ("AFRICA", "SUL_GLOBAL"))
      .toDF("r_nome", "macro_regiao")
    Tables.region(s, d)
      .join(broadcast(macroRegion), normalizeText(col("r_name")) === col("r_nome"), "left")
      .select(col("r_regionkey"), col("r_name"),
        coalesce(col("macro_regiao"), lit("OUTROS")).as("macro_regiao"))
      .orderBy(col("r_regionkey"))
  }

  /** J6: multi-way star join with composite keys
    * (`NotasDevolvidasCanceladas.sql:25-35`, `SLA…Completo.sql:176-234`):
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region → revenue per
    * region/year. Dims broadcast; the one fact-fact join shuffles on
    * orderkey. */
  val j6StarJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("ano"))
      .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).cast("double").as("receita"),
        count(lit(1)).as("itens"))
      .orderBy(col("r_name"), col("ano"))
  }

  /** J7: join to deduplicated subquery (`SP_SMT_Scrap_SKU.sql:30-34`). */
  val j7DedupJoin: Q = (s, d) => {
    val sold = Tables.lineitem(s, d).select(col("l_partkey")).distinct()
    Tables.part(s, d)
      .join(sold, col("p_partkey") === col("l_partkey"), "left")
      .select(col("p_partkey"), col("l_partkey").isNotNull.as("tem_venda"))
      .orderBy(col("p_partkey"))
  }

  /** J9: semi-join — restrict to the active set
    * (`Códigos Úteis SQL/SSS R$.sql:14-19`). */
  val j9Semi: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** J10: anti-join — exclusion semantics
    * (`Códigos Úteis SQL/Recorrência.sql:20-34`): customers with no
    * urgent order. */
  val j10Anti: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** J11: correlated scalar subquery → join on grouped DF
    * (`vw_KPI_Alerta_Churn.sql:5,12`): each order vs its customer's
    * total. */
  val j11ScalarSubquery: Q = (s, d) => {
    val perCust = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("ck"))
      .agg(dsum(col("o_totalprice")).as("total_cliente"))
    Tables.orders(s, d)
      .join(perCust, col("o_custkey") === col("ck"))
      .select(col("o_orderkey"),
        dec2(col("o_totalprice")).cast("double").as("valor"),
        col("total_cliente"))
      .orderBy(col("o_orderkey"))
  }

  /** J12: interval-condition join (equi + range predicate,
    * `Recorrencia_TKM.sql:24-25`): items shipped within 30 days of the
    * order date. */
  val j12RangeJoin: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") <= date_add(col("o_orderdate"), 30))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("o_orderdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** J13: self-consolidation join of ranked CTEs
    * (`View_SMT_AçõesDefinidas.sql:52-62`): per-nation order volume ⋈
    * top mktsegment (rn=1) ⋈ top priority (rn=1). */
  val j13RankedCtes: Q = (s, d) => {
    val co = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
    val volume = co.groupBy(col("c_nationkey").as("nk_v")).agg(count(lit(1)).as("pedidos"))
    def top1(keyCol: String, alias: String, outKey: String): DataFrame = {
      val grouped = co.groupBy(col("c_nationkey").as(outKey), col(keyCol).as(alias))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col(outKey)).orderBy(col("cnt").desc, col(alias))
      grouped.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col(outKey), col(alias))
    }
    val topSeg = top1("c_mktsegment", "segmento_top", "nk_s")
    val topPrio = top1("o_orderpriority", "prioridade_top", "nk_p")
    volume
      .join(topSeg, col("nk_v") === col("nk_s"), "left")
      .join(topPrio, col("nk_v") === col("nk_p"), "left")
      .select(col("nk_v").as("nationkey"), col("pedidos"),
        col("segmento_top"), col("prioridade_top"))
      .orderBy(col("nationkey"))
  }

  /** J14: substring-match dictionary join ("contains join",
    * `De-Para Defeitos Telecontrol.py:27-54`): map p_type to the first
    * matching standard term in dictionary priority order (priority
    * column makes the reference's file-order semantics deterministic —
    * SURVEY §7.4 risk 7). Broadcast nested-loop on a tiny dict. */
  val j14ContainsJoin: Q = (s, d) => {
    import s.implicits._
    val dict = Seq(("ECO", 1), ("PROMO", 2), ("STANDARD", 3), ("LARGE", 4), ("SMALL", 5))
      .toDF("termo", "prioridade")
    Tables.part(s, d)
      .join(broadcast(dict), col("p_type").contains(col("termo")), "left")
      .groupBy(col("p_partkey"))
      .agg(min_by(col("termo"), col("prioridade")).as("termo_padrao"))
      .orderBy(col("p_partkey"))
  }

  /** J15 (beyond-reference): distributed as-of join — for each
    * purchase event, the latest click at-or-before its timestamp for
    * the same user (trade/quote alignment shape; SURVEY §2.3 notes the
    * reference lacks as-of joins). Spark-first formulation: instead of
    * a per-row backward probe or a range join that explodes to
    * candidates × quotes, tag both sides, union them into one stream
    * sorted by (ts, side) per user, and carry the last click forward
    * with last_value(ignoreNulls) — ONE shuffle on user_id, linear
    * work, no broadcast requirement on either side; this is the shape
    * that survives 100 TB of events. Clicks are pre-collapsed to one
    * row per (user, ts) so tie-breaks are engine-independent. */
  val j15Asof: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts"), lit(0).as("lado"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"), col("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("lado"),
        col("event_id"), col("value"), lit(null).cast("long").as("click_id"))
    // at equal ts the click sorts first (lado 0 < 1) → "at-or-before"
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("lado"))
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("last_click_id",
        last(col("click_id"), ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        last(when(col("lado") === 0, col("ts")), ignoreNulls = true).over(w))
      .filter(col("lado") === 1 && col("last_click_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("last_click_id").as("click_id"), col("last_click_ts").as("click_ts"))
      .orderBy(col("event_id"))
  }

  val defs: Map[String, Q] = Map(
    "j15_asof" -> j15Asof,
    "j1_left_enrich" -> j1LeftEnrich,
    "j2_lookup" -> j2Lookup,
    "j3_outer_coalesce" -> j3OuterCoalesce,
    "j4_date_join" -> j4DateJoin,
    "j5_static_dim" -> j5StaticDim,
    "j6_star_join" -> j6StarJoin,
    "j7_dedup_join" -> j7DedupJoin,
    "j9_semi" -> j9Semi,
    "j10_anti" -> j10Anti,
    "j11_scalar_subquery" -> j11ScalarSubquery,
    "j12_range_join" -> j12RangeJoin,
    "j13_ranked_ctes" -> j13RankedCtes,
    "j14_contains_join" -> j14ContainsJoin)

  val oracles: Map[String, String] = Map(
    "j15_asof" -> """
      WITH clicks AS (
        SELECT user_id, ts AS click_ts, MAX(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      purchases AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase')
      SELECT p.event_id, p.user_id, p.ts, p.value, c.click_id, c.click_ts
      FROM purchases p ASOF JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.click_ts
      ORDER BY p.event_id""",
    "j1_left_enrich" -> """
      SELECT c_custkey,
        CASE WHEN n.n_name IS NULL OR r.r_name IS NULL THEN NULL
             ELSE UPPER(TRIM(n.n_name)) || '|' || UPPER(TRIM(r.r_name)) END
          AS chave_nacao_regiao
      FROM customer c
      LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      ORDER BY c_custkey""",
    "j2_lookup" -> """
      SELECT l_orderkey, l_linenumber, p_brand
      FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      ORDER BY l_orderkey, l_linenumber""",
    "j3_outer_coalesce" -> s"""
      WITH abertos AS (
        SELECT o_custkey AS ck, ${sqlDsum("o_totalprice")} AS total_aberto
        FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey),
      fechados AS (
        SELECT o_custkey AS ck, ${sqlDsum("o_totalprice")} AS total_fechado
        FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey)
      SELECT COALESCE(a.ck, f.ck) AS cliente,
        COALESCE(total_aberto, 0.0) AS total_aberto,
        COALESCE(total_fechado, 0.0) AS total_fechado
      FROM abertos a FULL OUTER JOIN fechados f ON a.ck = f.ck
      ORDER BY cliente""",
    "j4_date_join" -> s"""
      WITH pedidos AS (
        SELECT CAST(o_orderdate AS DATE) AS dia,
          ${sqlDsum("o_totalprice")} AS total_pedidos
        FROM orders GROUP BY 1),
      embarques AS (
        SELECT CAST(l_shipdate AS DATE) AS dia,
          ${sqlDsum("l_extendedprice")} AS total_embarcado
        FROM lineitem GROUP BY 1)
      SELECT p.dia, total_pedidos, total_embarcado
      FROM pedidos p JOIN embarques e ON p.dia = e.dia
      ORDER BY p.dia""",
    "j5_static_dim" -> """
      SELECT r_regionkey, r_name,
        COALESCE(m.macro_regiao, 'OUTROS') AS macro_regiao
      FROM region
      LEFT JOIN (VALUES ('AMERICA','OCIDENTE'),('EUROPE','OCIDENTE'),
        ('ASIA','ORIENTE'),('AFRICA','SUL_GLOBAL')) AS m(r_nome, macro_regiao)
        ON UPPER(TRIM(r_name)) = m.r_nome
      ORDER BY r_regionkey""",
    "j6_star_join" -> s"""
      SELECT r_name, YEAR(o_orderdate) AS ano,
        CAST(SUM(${sqlRevenue("l_extendedprice", "l_discount")}) AS DOUBLE) AS receita,
        COUNT(*) AS itens
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, YEAR(o_orderdate)
      ORDER BY r_name, ano""",
    "j7_dedup_join" -> """
      SELECT p_partkey, (l_partkey IS NOT NULL) AS tem_venda
      FROM part LEFT JOIN (SELECT DISTINCT l_partkey FROM lineitem) li
        ON p_partkey = l_partkey
      ORDER BY p_partkey""",
    "j9_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",
    "j10_anti" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""",
    "j11_scalar_subquery" -> s"""
      SELECT o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS valor,
        (SELECT ${sqlDsum("o2.o_totalprice")} FROM orders o2
          WHERE o2.o_custkey = o.o_custkey) AS total_cliente
      FROM orders o ORDER BY o_orderkey""",
    "j12_range_join" -> """
      SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
      ORDER BY l_orderkey, l_linenumber""",
    "j13_ranked_ctes" -> """
      WITH co AS (
        SELECT c_nationkey, c_mktsegment, o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey),
      volume AS (SELECT c_nationkey, COUNT(*) AS pedidos FROM co GROUP BY 1),
      seg AS (
        SELECT c_nationkey, c_mktsegment AS segmento_top,
          ROW_NUMBER() OVER (PARTITION BY c_nationkey
            ORDER BY COUNT(*) DESC, c_mktsegment) AS rn
        FROM co GROUP BY c_nationkey, c_mktsegment),
      prio AS (
        SELECT c_nationkey, o_orderpriority AS prioridade_top,
          ROW_NUMBER() OVER (PARTITION BY c_nationkey
            ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
        FROM co GROUP BY c_nationkey, o_orderpriority)
      SELECT v.c_nationkey AS nationkey, v.pedidos,
        s.segmento_top, p.prioridade_top
      FROM volume v
      LEFT JOIN seg s ON v.c_nationkey = s.c_nationkey AND s.rn = 1
      LEFT JOIN prio p ON v.c_nationkey = p.c_nationkey AND p.rn = 1
      ORDER BY nationkey""",
    "j14_contains_join" -> """
      SELECT p_partkey, MIN_BY(d.termo, d.prioridade) AS termo_padrao
      FROM part
      LEFT JOIN (VALUES ('ECO',1),('PROMO',2),('STANDARD',3),('LARGE',4),
        ('SMALL',5)) AS d(termo, prioridade)
        ON contains(p_type, d.termo)
      GROUP BY p_partkey
      ORDER BY p_partkey""")
}
