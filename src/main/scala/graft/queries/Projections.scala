package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{ColumnSpec, SchemaMapping, Tables}
import graft.functions.BrFunctions._

/** SURVEY.md §2.2 projection / rename / filter / predicate operators.
  * Filters and projections here are all scan-pushable: each query is a
  * single narrow select+filter over one table, so Catalyst pushes the
  * predicate and the column list into the parquet reader (verified via
  * explain — `PushedFilters` / pruned `ReadSchema`). At 100 TB this is
  * the difference between reading 2 columns and reading 16.
  */
object Projections {

  type Q = (SparkSession, String) => DataFrame

  /** P1: mapping-driven select+rename+cast (the COLUMN_MAPPING_AND_TYPES
    * pattern, `ETL - Faturamento B2B.py:143-151`). */
  val p1SelectRename: Q = (s, d) => {
    val mapping = SchemaMapping.of(
      ColumnSpec("o_orderkey", "pedido_id", LongType),
      ColumnSpec("o_custkey", "cliente_id", LongType),
      ColumnSpec("o_totalprice", "valor_total", DoubleType,
        c => c.cast(DecimalType(15, 2)).cast(DoubleType)),
      ColumnSpec("o_orderdate", "data_pedido", DateType),
      ColumnSpec("o_orderstatus", "status", StringType, normalizeText))
    mapping(Tables.orders(s, d)).orderBy(col("pedido_id"))
  }

  /** P2: header normalization — trim/upper column names
    * (`Base de Produtos Mais Vendidos - Showroom.py:47`). */
  val p2HeaderNormalize: Q = (s, d) => {
    val df = Tables.region(s, d)
    df.toDF(df.columns.toIndexedSeq.map(_.trim.toUpperCase): _*).orderBy(col("R_REGIONKEY"))
  }

  /** P3: positional-fallback rename — rename by ordinal when the header
    * is unreliable (`Base de Produtos Mais Vendidos - Showroom.py:67-70`). */
  val p3PositionalRename: Q = (s, d) => {
    val df = Tables.nation(s, d)
    val names = Seq("id", "nome", "regiao_id")
    df.toDF(names ++ df.columns.drop(names.length): _*).orderBy(col("id"))
  }

  /** P4: fuzzy column mapping — resolve columns by substring of header
    * (`Ferramenta de Extração - TabelaFato.py:73-83`). Resolution happens
    * driver-side against `df.columns`; the plan is still a plain select. */
  val p4FuzzyMapping: Q = (s, d) => {
    val df = Tables.customer(s, d)
    def fuzzy(sub: String): String =
      df.columns.find(_.toLowerCase.contains(sub)).getOrElse(
        sys.error(s"no column matching '$sub'"))
    df.select(
      col(fuzzy("custkey")).as("cliente"),
      col(fuzzy("acctbal")).as("saldo"),
      col(fuzzy("mktsegment")).as("segmento"))
      .orderBy(col("cliente"))
  }

  /** P5: null-business-key row filter (`dropna(subset=keys)`,
    * `ETL - Venda B2B.py:232-241`). */
  val p5NullKeyFilter: Q = (s, d) =>
    Tables.orders(s, d)
      .na.drop("any", Seq("o_orderkey", "o_custkey", "o_orderdate"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey"))

  /** P6: cleaned-string inequality predicate
    * (`ETL - Primeiro Pedido.py:213-228`). */
  val p6PredicateFilter: Q = (s, d) =>
    Tables.customer(s, d)
      .filter(normalizeText(col("c_mktsegment")) =!= "BUILDING")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** P7: IN / NOT-IN exclusion lists (`Recorrencia_%.sql:15-17`). */
  val p7InFilter: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        !col("o_orderstatus").isin("P"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))

  /** P8: LIKE / regex predicates (`Tops Belmicro.sql:7-13`,
    * `NotasDevolvidasCanceladas.sql:53-60`). */
  val p8LikeFilter: Q = (s, d) =>
    Tables.part(s, d)
      .filter(col("p_type").like("%ECO%") &&
        col("p_brand").rlike("Brand#1[0-9]$"))
      .select(col("p_partkey"), col("p_type"), col("p_brand"))
      .orderBy(col("p_partkey"))

  /** P9: date-range predicates — BETWEEN + open bound
    * (`NotasDevolvidasCanceladas.sql:39`). */
  val p9DateRange: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").between(lit("1997-01-01"), lit("1997-12-31 23:59:59")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** P10: optional-parameter sentinel predicate
    * (`(p = 'TODOS' OR col = p)`, `PROD_Produtividade_Volume.sql:36-38`).
    * Exposed as a parameterized function; the registered query binds one
    * concrete segment and the spec covers the 'TODOS' pass-through. */
  def p10Param(segment: String): Q = (s, d) =>
    Tables.customer(s, d)
      .filter(lit(segment) === "TODOS" || normalizeText(col("c_mktsegment")) === segment)
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** P11: nested boolean rule sets ((A AND B) OR (C AND NOT A),
    * `NotasDevolvidasCanceladas.sql:62-88`). */
  val p11ComplexBool: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(
        (col("l_returnflag") === "R" && col("l_quantity") > 25) ||
        (col("l_discount") >= 0.05 && !(col("l_returnflag") === "R")))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("l_discount"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** P12: band/bucket CASE predicate (days-without-purchase bands,
    * `Códigos Úteis SQL/Recorrência.sql:36-45`). */
  val p12Bands: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0, "NEGATIVO")
          .when(col("c_acctbal") < 3000, "ATE_3K")
          .when(col("c_acctbal") < 7000, "3K_A_7K")
          .otherwise("ACIMA_7K").as("faixa_saldo"))
      .orderBy(col("c_custkey"))

  val defs: Map[String, Q] = Map(
    "p1_select_rename" -> p1SelectRename,
    "p2_header_normalize" -> p2HeaderNormalize,
    "p3_positional_rename" -> p3PositionalRename,
    "p4_fuzzy_mapping" -> p4FuzzyMapping,
    "p5_null_key_filter" -> p5NullKeyFilter,
    "p6_predicate_filter" -> p6PredicateFilter,
    "p7_in_filter" -> p7InFilter,
    "p8_like_filter" -> p8LikeFilter,
    "p9_date_range" -> p9DateRange,
    "p10_param_predicate" -> p10Param("MACHINERY"),
    "p11_complex_bool" -> p11ComplexBool,
    "p12_bands" -> p12Bands)

  val oracles: Map[String, String] = Map(
    "p1_select_rename" -> """
      SELECT o_orderkey AS pedido_id, o_custkey AS cliente_id,
        CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS DOUBLE) AS valor_total,
        CAST(o_orderdate AS DATE) AS data_pedido,
        UPPER(TRIM(o_orderstatus)) AS status
      FROM orders ORDER BY pedido_id""",
    "p2_header_normalize" -> """
      SELECT r_regionkey AS "R_REGIONKEY", r_name AS "R_NAME"
      FROM region ORDER BY 1""",
    "p3_positional_rename" -> """
      SELECT n_nationkey AS id, n_name AS nome, n_regionkey AS regiao_id
      FROM nation ORDER BY id""",
    "p4_fuzzy_mapping" -> """
      SELECT c_custkey AS cliente, c_acctbal AS saldo, c_mktsegment AS segmento
      FROM customer ORDER BY cliente""",
    "p5_null_key_filter" -> """
      SELECT o_orderkey, o_custkey, o_orderdate FROM orders
      WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
        AND o_orderdate IS NOT NULL
      ORDER BY o_orderkey""",
    "p6_predicate_filter" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE UPPER(TRIM(c_mktsegment)) <> 'BUILDING'
      ORDER BY c_custkey""",
    "p7_in_filter" -> """
      SELECT o_orderkey, o_orderpriority, o_orderstatus FROM orders
      WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        AND o_orderstatus NOT IN ('P')
      ORDER BY o_orderkey""",
    "p8_like_filter" -> """
      SELECT p_partkey, p_type, p_brand FROM part
      WHERE p_type LIKE '%ECO%' AND regexp_matches(p_brand, 'Brand#1[0-9]$')
      ORDER BY p_partkey""",
    "p9_date_range" -> """
      SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
        AND TIMESTAMP '1997-12-31 23:59:59'
      ORDER BY l_orderkey, l_linenumber""",
    "p10_param_predicate" -> """
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE 'MACHINERY' = 'TODOS' OR UPPER(TRIM(c_mktsegment)) = 'MACHINERY'
      ORDER BY c_custkey""",
    "p11_complex_bool" -> """
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount
      FROM lineitem
      WHERE (l_returnflag = 'R' AND l_quantity > 25)
         OR (l_discount >= 0.05 AND NOT (l_returnflag = 'R'))
      ORDER BY l_orderkey, l_linenumber""",
    "p12_bands" -> """
      SELECT c_custkey,
        CASE WHEN c_acctbal < 0 THEN 'NEGATIVO'
             WHEN c_acctbal < 3000 THEN 'ATE_3K'
             WHEN c_acctbal < 7000 THEN '3K_A_7K'
             ELSE 'ACIMA_7K' END AS faixa_saldo
      FROM customer ORDER BY c_custkey""")
}
