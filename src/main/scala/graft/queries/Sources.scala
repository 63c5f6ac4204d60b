package graft.queries

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}

/** SURVEY.md §2.1 sources / sinks. Excel and JDBC aren't in this
  * container (SURVEY maps them to CSV semantics and parquet-backed
  * views, S1/S7); the queries here exercise the real reader/writer
  * surface: CSV options + encoding, multi-source tagged union scans,
  * schema probing, parquet sinks with overwrite and dynamic partition
  * refresh. Sink queries write to a temp dir and read back, so the
  * oracle checks the full write→read roundtrip.
  */
object Sources {
  import Det._

  type Q = (SparkSession, String) => DataFrame

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** S1+S2+S4 (Excel, real): multi-sheet XLSX round-trip through the
    * dependency-free OOXML reader/writer ([[graft.sources.Xlsx]]) —
    * customers exported one sheet per segment (`df.to_excel` shape,
    * `ETL - CRM.py:67-76`), read back sheet-by-sheet with header
    * promotion, tagged, unioned, projected and cast (the
    * COLUMN_MAPPING step). The oracle reads the same rows from
    * parquet, so the hash check covers the whole XLSX write→read
    * path including numeric round-trips (Double.toString → cast is
    * exact). Excel is an export format: the per-sheet collect is the
    * reference's own `to_excel` driver-side shape, bounded by
    * Excel's 1M-row sheet cap — corpus IO stays on parquet. */
  val s1ExcelRoundtrip: Q = (s, d) => {
    // stable path (overwritten per run, not accumulated): repeated
    // bench invocations must not litter the temp dir with workbooks
    val dir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_s1_xlsx")
    Files.createDirectories(dir)
    val path = dir.resolve("clientes.xlsx").toString
    val header = Seq("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    // ONE collect; the per-sheet split happens driver-side (this is
    // an export of a dim-sized table — the to_excel shape)
    val rows = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"))
      .orderBy("c_custkey").collect()
    val sheets = rows.groupBy(_.getString(2)).toSeq.sortBy(_._1)
      .map { case (seg, rs) =>
        (seg, header, rs.toSeq.map(r => Seq[Any](r.getLong(0),
          r.getString(1), r.getString(2), r.getDouble(3))))
      }
    graft.sources.Xlsx.write(path, sheets)
    graft.sources.Xlsx.sheetNames(path).map { sheet =>
      graft.sources.Xlsx.read(s, path, sheet)
        .withColumn("origem_aba", lit(sheet))
    }.reduce(_.unionByName(_))
      .select(col("c_custkey").cast("long"), col("c_name"),
        col("origem_aba"), col("c_acctbal").cast("double"))
      .orderBy(col("c_custkey"))
  }

  /** S3: schema probe — limit-0 read validates columns without
    * scanning data (`ETL - Primeiro Pedido.py:112`). */
  val s3SchemaProbe: Q = (s, d) => {
    import s.implicits._
    val schema = Tables.orders(s, d).limit(0).schema
    schema.fields.toSeq.map(f => (f.name, f.dataType.simpleString))
      .toDF("coluna", "tipo").orderBy(col("coluna"))
  }

  /** S4: multi-sheet union scan — read N sources, tag each, align by
    * name (`ETL - CRM.py:67-76`, `Ferramenta de Extração -
    * TabelaFato.py:58-95`). Sheets simulated by per-status splits. */
  val s4MultiSheetUnion: Q = (s, d) => {
    val base = tmpDir("sheets")
    val orders = Tables.orders(s, d)
    Seq("F", "O", "P").foreach { st =>
      orders.filter(col("o_orderstatus") === st)
        .write.mode("overwrite").parquet(s"$base/aba_$st")
    }
    Seq("F", "O", "P").map { st =>
      s.read.parquet(s"$base/aba_$st")
        .withColumn("origem_aba", lit(s"aba_$st"))
    }.reduce(_.unionByName(_))
      .select(col("o_orderkey"), col("origem_aba"))
      .orderBy(col("o_orderkey"))
  }

  /** S5: CSV scan with explicit sep/encoding + fallback chain
    * (`Conversor de Formatos.py:52-70`): write ;-separated latin-1,
    * read back trying utf-8 then latin-1 (driver-side loop, as the
    * reference does). */
  val s5CsvRoundtrip: Q = (s, d) => {
    val dir = tmpDir("csv") + "/nation"
    Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite")
      .option("header", "true").option("sep", ";").option("encoding", "ISO-8859-1")
      .csv(dir)
    val encodings = Seq("UTF-8", "ISO-8859-1")
    val parsed = encodings.iterator.map { enc =>
      s.read.option("header", "true").option("sep", ";").option("encoding", enc)
        .option("inferSchema", "true").csv(dir)
    }.find(df => df.columns.contains("n_nationkey")).get
    parsed.orderBy(col("n_nationkey"))
  }

  /** S6+S10/S11: parquet sink (overwrite, the DROP+CREATE+INSERT
    * analog) then scan back (`Conversor de Formatos.py:172-188`,
    * `ETL - Faturamento B2B.py:210-302`). */
  val s6ParquetRoundtrip: Q = (s, d) => {
    val dir = tmpDir("pq") + "/customer"
    Tables.customer(s, d).write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** S12: idempotent date-partition refresh — dynamic partition
    * overwrite replaces exactly one year partition
    * (`ETL - Análise Preditiva…Machine Learning.py:187-207`). */
  val s12PartitionRefresh: Q = (s, d) => {
    val dir = tmpDir("partitioned") + "/orders"
    // repartition on the partition column before a partitionBy write —
    // one writer task per partition, no small-files explosion (the
    // standard shape for dynamic-partition loads at scale)
    val orders = Tables.orders(s, d)
      .withColumn("ano", year(col("o_orderdate")))
      .repartition(col("ano"))
    orders.write.partitionBy("ano").mode("overwrite").parquet(dir)
    // refresh 1997 only: same rows with a corrected flag column would
    // normally arrive; here the refresh doubles valor for visibility
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    orders.filter(col("ano") === 1997)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .write.partitionBy("ano").mode("overwrite").parquet(dir)
    s.read.parquet(dir)
      .groupBy(col("ano"))
      .agg(dsum(col("o_totalprice")).as("total"), count(lit(1)).as("pedidos"))
      .orderBy(col("ano"))
  }

  val defs: Map[String, Q] = Map(
    "s1_excel_roundtrip" -> s1ExcelRoundtrip,
    "s3_schema_probe" -> s3SchemaProbe,
    "s4_multi_sheet_union" -> s4MultiSheetUnion,
    "s5_csv_roundtrip" -> s5CsvRoundtrip,
    "s6_parquet_roundtrip" -> s6ParquetRoundtrip,
    "s12_partition_refresh" -> s12PartitionRefresh)

  val oracles: Map[String, String] = Map(
    "s1_excel_roundtrip" -> """
      SELECT c_custkey, c_name, c_mktsegment AS origem_aba, c_acctbal
      FROM customer ORDER BY c_custkey""",
    "s3_schema_probe" -> """
      SELECT * FROM (VALUES
        ('o_orderkey', 'bigint'), ('o_custkey', 'bigint'),
        ('o_orderstatus', 'string'), ('o_totalprice', 'double'),
        ('o_orderdate', 'timestamp_ntz'), ('o_orderpriority', 'string'))
        AS t(coluna, tipo)
      ORDER BY coluna""",
    "s4_multi_sheet_union" -> """
      SELECT o_orderkey, 'aba_' || o_orderstatus AS origem_aba
      FROM orders ORDER BY o_orderkey""",
    "s5_csv_roundtrip" -> """
      SELECT n_nationkey, n_name, n_regionkey FROM nation
      ORDER BY n_nationkey""",
    "s6_parquet_roundtrip" -> """
      SELECT c_custkey, c_name, c_mktsegment FROM customer
      ORDER BY c_custkey""",
    "s12_partition_refresh" -> s"""
      SELECT YEAR(o_orderdate) AS ano,
        CAST(SUM(CAST(CASE WHEN YEAR(o_orderdate) = 1997
          THEN o_totalprice * 2 ELSE o_totalprice END AS DECIMAL(18,2)))
          AS DOUBLE) AS total,
        COUNT(*) AS pedidos
      FROM orders GROUP BY 1 ORDER BY ano""")
}
