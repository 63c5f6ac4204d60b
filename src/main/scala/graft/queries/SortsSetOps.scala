package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}
import graft.functions.BrFunctions

/** SURVEY.md §2.6 sorts/limits/top-k and §2.7 set operations.
  *
  * Scale notes: global `orderBy` is a range-partitioned sort (sampled
  * boundaries) — fine for reporting outputs; top-k uses
  * `orderBy().limit(k)` which Spark executes as TakeOrderedAndProject
  * (per-partition heap + driver merge, no full sort). Set ops are
  * union (no shuffle) or hash-based except/intersect on the
  * deduplicated key.
  */
object SortsSetOps {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  /** O1: multi-key sort asc/desc (`SLA de Produção…sql:237-240`). */
  val o1MultiSort: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_acctbal"), col("c_custkey"))
      .orderBy(col("c_nationkey").asc, col("c_acctbal").desc, col("c_custkey").asc)

  /** O2: custom collation — pt-BR month-name order via literal
    * position map, never JVM locale (`PROD_Produtividade_FPY.sql:43`,
    * SURVEY §7.4 risk 1). */
  val o2MonthCollation: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(BrFunctions.monthNamePt(month(col("o_orderdate"))).as("mes_nome"))
      .agg(dsum(col("o_totalprice")).as("total"))
      .withColumn("mes_n", BrFunctions.monthNumberPt(col("mes_nome")))
      .orderBy(col("mes_n"))

  /** O3: conditional sort key — chronological when param='TUDO', else
    * by metric (`SP_SMT_Scrap_Por_Peça.sql:38-63`). Registered with a
    * concrete param; the function is the operator. */
  def o3ConditionalSort(param: String): Q = (s, d) => {
    val base = Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("ano"), month(col("o_orderdate")).as("mes"))
      .agg(dsum(col("o_totalprice")).as("total"))
    val sortKey = when(lit(param) === "TUDO",
        col("ano") * 100 + col("mes"))
      .otherwise(-col("total"))
    base.withColumn("chave_ordem", sortKey.cast("double"))
      .orderBy(col("chave_ordem"), col("ano"), col("mes"))
  }

  /** O4: total-row-last ordering via grouping flag
    * (`vw_Inadimplencia_Base.sql:54`, `SMT_Snippet_RMA.sql:34-35`). */
  val o4TotalLast: Q = (s, d) =>
    Tables.orders(s, d)
      .rollup(col("o_orderpriority"))
      .agg(grouping(col("o_orderpriority")).cast("int").as("linha_total"),
        dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("--- TOTAL ---")).as("prioridade"),
        col("total"), col("linha_total"))
      .orderBy(col("linha_total"), col("total").desc)

  /** O5: ORDER BY … LIMIT top-k (`SMT_Top10_Acoes.sql:47-49`) —
    * TakeOrderedAndProject, no global sort. */
  val o5TopK: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(dsum(col("o_totalprice")).as("total"))
      .orderBy(col("total").desc, col("c_custkey"))
      .limit(10)

  /** O6: nlargest / head(N) (`ETL - Estoque Belmicro Geral.py:45`). */
  val o6Nlargest: Q = (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(3)

  /** O7: per-group head(N) after rank sort
    * (`Base de Produtos Mais Vendidos - Showroom.py:127-133`). */
  val o7PerGroupHead: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"), col("rn"))
      .orderBy(col("c_mktsegment"), col("rn"))
  }

  /** O8 (beyond-reference): the same per-group top-k computed by the
    * engine's custom sort-free physical operator
    * (plans/TopKPerGroup — bounded heaps, map-side partial top-k,
    * shuffle of survivors only). Same semantics as the window
    * formulation (o7/w4); the oracle is the row_number SQL. */
  val o8TopkPhysical: Q = (s, d) =>
    graft.plans.TopK
      .perGroup(Tables.orders(s, d), Seq("o_orderpriority"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))

  /** U1: UNION ALL multi-source consolidation with source tag
    * (`SLA de Produção - Completo.sql:130-236`, `ETL - CRM.py:67-76`). */
  val u1UnionTagged: Q = (s, d) => {
    val closed = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"), lit("HISTORICO").as("origem"))
    val open = Tables.orders(s, d).filter(col("o_orderstatus") =!= "F")
      .select(col("o_orderkey"), col("o_totalprice"), lit("CORRENTE").as("origem"))
    closed.unionByName(open)
      .select(col("o_orderkey"), dec2(col("o_totalprice")).cast("double").as("valor"),
        col("origem"))
      .orderBy(col("o_orderkey"))
  }

  /** U3: concat with missing columns (allowMissingColumns, pandas
    * `concat` of heterogeneous sheets, `Algoritmo de Varredura -
    * Planilhas.py:103`). */
  val u3UnionByNameMissing: Q = (s, d) => {
    val a = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
    val b = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_orderpriority"))
    a.unionByName(b, allowMissingColumns = true)
      .select(col("o_orderkey"),
        dec2(col("o_totalprice")).cast("double").as("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** U4: inline literal table (`Cenario_YearToYear.sql:6-24`): the
    * business-days-per-month dim. */
  val u4InlineLiteral: Q = (s, d) => {
    import s.implicits._
    Seq((1, 22), (2, 20), (3, 21), (4, 20), (5, 22), (6, 20),
      (7, 23), (8, 21), (9, 21), (10, 22), (11, 20), (12, 20))
      .toDF("mes", "dias_uteis")
      .orderBy(col("mes"))
  }

  /** U5a: EXCEPT — clients with open orders but no closed ones
    * (§2.7 U5: free in Spark, absent in the reference). */
  val u5Except: Q = (s, d) => {
    val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val closed = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    open.except(closed).orderBy(col("o_custkey"))
  }

  /** U5b: INTERSECT — clients with both open and closed orders. */
  val u6Intersect: Q = (s, d) => {
    val open = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val closed = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    open.intersect(closed).orderBy(col("o_custkey"))
  }

  val defs: Map[String, Q] = Map(
    "o1_multi_sort" -> o1MultiSort,
    "o2_month_collation" -> o2MonthCollation,
    "o3_conditional_sort" -> o3ConditionalSort("TUDO"),
    "o4_total_last" -> o4TotalLast,
    "o5_topk" -> o5TopK,
    "o6_nlargest" -> o6Nlargest,
    "o7_per_group_head" -> o7PerGroupHead,
    "o8_topk_physical" -> o8TopkPhysical,
    "u1_union_tagged" -> u1UnionTagged,
    "u3_union_missing_cols" -> u3UnionByNameMissing,
    "u4_inline_literal" -> u4InlineLiteral,
    "u5_except" -> u5Except,
    "u6_intersect" -> u6Intersect)

  private val monthCase: String =
    BrFunctions.monthsPt.zipWithIndex
      .map { case (m, i) => s"WHEN ${i + 1} THEN '$m'" }
      .mkString("CASE MONTH(o_orderdate) ", " ", " END")

  val oracles: Map[String, String] = Map(
    "o8_topk_physical" -> """
      SELECT o_orderpriority, o_orderkey, o_totalprice
      FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
              ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 3
      ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""",
    "o1_multi_sort" -> """
      SELECT c_nationkey, c_acctbal, c_custkey FROM customer
      ORDER BY c_nationkey ASC, c_acctbal DESC, c_custkey ASC""",
    "o2_month_collation" -> s"""
      SELECT mes_nome, ${sqlDsum("o_totalprice")} AS total,
        CAST(mes_n AS INT) AS mes_n
      FROM (SELECT $monthCase AS mes_nome, MONTH(o_orderdate) AS mes_n,
              o_totalprice FROM orders)
      GROUP BY mes_nome, mes_n ORDER BY mes_n""",
    "o3_conditional_sort" -> s"""
      SELECT ano, mes, total,
        CAST(ano * 100 + mes AS DOUBLE) AS chave_ordem
      FROM (SELECT YEAR(o_orderdate) AS ano, MONTH(o_orderdate) AS mes,
              ${sqlDsum("o_totalprice")} AS total
            FROM orders GROUP BY 1, 2)
      ORDER BY chave_ordem, ano, mes""",
    "o4_total_last" -> s"""
      SELECT COALESCE(o_orderpriority, '--- TOTAL ---') AS prioridade,
        ${sqlDsum("o_totalprice")} AS total,
        CAST(GROUPING(o_orderpriority) AS INT) AS linha_total
      FROM orders GROUP BY ROLLUP (o_orderpriority)
      ORDER BY linha_total, total DESC""",
    "o5_topk" -> s"""
      SELECT c_custkey, c_name, ${sqlDsum("o_totalprice")} AS total
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY total DESC, c_custkey LIMIT 10""",
    "o6_nlargest" -> """
      SELECT p_partkey, p_name, p_retailprice FROM part
      ORDER BY p_retailprice DESC, p_partkey LIMIT 3""",
    "o7_per_group_head" -> """
      SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
          ROW_NUMBER() OVER (PARTITION BY c_mktsegment
            ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer)
      WHERE rn <= 5 ORDER BY c_mktsegment, rn""",
    "u1_union_tagged" -> """
      SELECT o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS valor,
        'HISTORICO' AS origem
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE),
        'CORRENTE'
      FROM orders WHERE o_orderstatus <> 'F'
      ORDER BY o_orderkey""",
    "u3_union_missing_cols" -> """
      SELECT o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
        NULL AS o_orderpriority
      FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_orderkey, NULL, o_orderpriority
      FROM orders WHERE o_orderstatus = 'O'
      ORDER BY o_orderkey""",
    "u4_inline_literal" -> """
      SELECT * FROM (VALUES (1,22),(2,20),(3,21),(4,20),(5,22),(6,20),
        (7,23),(8,21),(9,21),(10,22),(11,20),(12,20))
        AS t(mes, dias_uteis)
      ORDER BY mes""",
    "u5_except" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_custkey""",
    "u6_intersect" -> """
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ORDER BY o_custkey""")
}
