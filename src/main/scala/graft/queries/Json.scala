package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** SURVEY.md §2.9 semi-structured (JSON) handling.
  *
  * The reference flattens REST payloads immediately after fetch
  * (`cnpj_core.py:251-320`); here the same operators run over the
  * `events.props` JSON column and over JSON synthesized from table
  * rows so the oracle can verify the full parse→flatten roundtrip.
  * `from_json`/`get_json_object` are codegen'd expressions — they run
  * inside the scan stage at 100 TB, no shuffle.
  */
object Json {

  type Q = (SparkSession, String) => DataFrame

  /** N1: JSON payload → columns with multi-key fallback coalesce
    * (`cnpj_core.py:251-255`): `pick(d, "k", "missing")`. */
  val n1JsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        coalesce(
          get_json_object(col("props"), "$.k"),
          get_json_object(col("props"), "$.k_alt"))
          .cast("int").as("k"))
      .orderBy(col("event_id"))

  /** N2: nested array extraction — explode a parsed JSON array
    * (`cnpj_core.py:258-285`): rows → per-nation JSON doc with a `qsa`
    * partner array → `from_json` + `explode` back to rows. */
  val n2NestedExplode: Q = (s, d) => {
    val doc = Tables.customer(s, d)
      .filter(col("c_custkey") <= 100)
      .groupBy(col("c_nationkey"))
      .agg(to_json(collect_list(struct(
        col("c_custkey").as("id"),
        col("c_name").as("nome")))).as("payload"))
    val schema = ArrayType(StructType(Seq(
      StructField("id", LongType), StructField("nome", StringType))))
    doc.select(col("c_nationkey"),
        explode(from_json(col("payload"), schema)).as("socio"))
      .select(col("c_nationkey"),
        col("socio.id").as("id"), col("socio.nome").as("nome"))
      .orderBy(col("c_nationkey"), col("id"))
  }

  /** N3: header-promotion of a positional table — first row is the
    * header (`API Extrator Renda Per Capita - IBGE.py:11-13`). */
  val n3HeaderPromotion: Q = (s, d) => {
    import s.implicits._
    val raw = Seq(
      ("regiao", "populacao"),
      ("NORTE", "100"), ("SUL", "200"), ("LESTE", "300"))
      .toDF("c0", "c1")
    val header = raw.limit(1).collect()(0) // 1-row header fetch, driver-side by design
    raw.filter(col("c0") =!= lit(header.getString(0)))
      .select(col("c0").as(header.getString(0)),
        col("c1").cast("long").as(header.getString(1)))
      .orderBy(col("regiao"))
  }

  /** N4: API envelope unwrap `{"value": [...]}`
    * (`PTAX - Conversor de Moedas BACEN.py:69-82`). */
  val n4EnvelopeUnwrap: Q = (s, d) => {
    val envelope = Tables.orders(s, d)
      .filter(col("o_orderkey") <= 500)
      .groupBy(year(col("o_orderdate")).as("ano"))
      .agg(to_json(struct(
        lit("ok").as("status"),
        collect_list(struct(
          col("o_orderkey").as("id"),
          col("o_orderpriority").as("prio"))).as("value"))).as("resposta"))
    val schema = StructType(Seq(
      StructField("status", StringType),
      StructField("value", ArrayType(StructType(Seq(
        StructField("id", LongType), StructField("prio", StringType)))))))
    envelope
      .select(col("ano"), from_json(col("resposta"), schema).as("r"))
      .select(col("ano"), explode(col("r.value")).as("item"))
      .select(col("ano"), col("item.id").as("id"), col("item.prio").as("prio"))
      .orderBy(col("ano"), col("id"))
  }

  val defs: Map[String, Q] = Map(
    "n1_json_extract" -> n1JsonExtract,
    "n2_nested_explode" -> n2NestedExplode,
    "n3_header_promotion" -> n3HeaderPromotion,
    "n4_envelope_unwrap" -> n4EnvelopeUnwrap)

  val oracles: Map[String, String] = Map(
    "n1_json_extract" -> """
      SELECT event_id,
        CAST(COALESCE(json_extract_string(props, '$.k'),
          json_extract_string(props, '$.k_alt')) AS INT) AS k
      FROM events ORDER BY event_id""",
    // n2/n4 build JSON and parse it back, so the oracle is the identity
    // over the same source rows — it checks that parse∘serialize+explode
    // loses nothing.
    "n2_nested_explode" -> """
      SELECT c_nationkey, c_custkey AS id, c_name AS nome
      FROM customer WHERE c_custkey <= 100
      ORDER BY c_nationkey, id""",
    "n3_header_promotion" -> """
      SELECT regiao, populacao FROM (VALUES ('NORTE', 100), ('SUL', 200),
        ('LESTE', 300)) AS t(regiao, populacao)
      ORDER BY regiao""",
    "n4_envelope_unwrap" -> """
      SELECT YEAR(o_orderdate) AS ano, o_orderkey AS id, o_orderpriority AS prio
      FROM orders WHERE o_orderkey <= 500
      ORDER BY ano, id""")
}
