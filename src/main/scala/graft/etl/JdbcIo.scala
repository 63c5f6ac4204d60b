package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types._
import graft.core.SchemaMapping

/** JDBC source/sink wrappers — the reference's daily-bread MySQL/SQL
  * Server path (S7/S10/S11): explicit DDL from the declared column
  * mapping + batched insert (`ETL - Faturamento B2B.py:240-302`),
  * `to_sql(if_exists='replace')` (`EDA - Faturamento.py:64`), and the
  * pushdown read (`EDA - Faturamento.py:76-83`, a WHERE-filtered
  * SELECT shipped to the database).
  *
  * Spark-native shape: `spark.read.jdbc` already pushes filters and
  * prunes columns at the source when given a dbtable/query, and
  * `partitionColumn/lowerBound/upperBound/numPartitions` turns the
  * single-connection pandas read into N parallel range-partitioned
  * connections — the 100 TB story for a JDBC source. The sink drives
  * `df.write.jdbc` with `createTableColumnTypes` generated from the
  * same [[graft.core.SchemaMapping]] the staging pipeline uses, so
  * the DDL the reference builds by hand falls out of the one mapping
  * declaration.
  *
  * The build container has no database, so these paths cannot be
  * oracle-checked end-to-end here; the DDL/type generation and option
  * plumbing are unit-tested (JdbcIoSpec) and the load/overwrite
  * SEMANTICS are covered by the parquet-backed carriers (s6, s12,
  * etl1). */
object JdbcIo {

  /** Spark type → MySQL DDL type, mirroring the reference's
    * SQLAlchemy type→DDL conversion (`ETL - Faturamento B2B.py:54-72`:
    * DECIMAL(15,2), VARCHAR(n), BIGINT, DATETIME, ...). Strings
    * default to VARCHAR(255) exactly like the reference's fallback. */
  def mysqlType(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "INT"
    case LongType                => "BIGINT"
    case FloatType               => "FLOAT"
    case DoubleType              => "DOUBLE"
    case d: DecimalType          => s"DECIMAL(${d.precision},${d.scale})"
    case BooleanType             => "TINYINT(1)"
    case DateType                => "DATE"
    case TimestampType           => "DATETIME"
    case StringType              => "VARCHAR(255)"
    case BinaryType              => "BLOB"
    case _ =>
      // reference fallback: "Usando String(255) como padrão para DDL"
      "VARCHAR(255)"
  }

  /** `createTableColumnTypes` clause for `df.write.jdbc` — column
    * types only, in mapping order. */
  def createTableColumnTypes(mapping: SchemaMapping): String =
    mapping.specs.map(s => s"${s.target} ${mysqlType(s.dataType)}")
      .mkString(", ")

  /** Full CREATE TABLE DDL in the reference's explicit-DDL style
    * (backticked identifiers, nullable columns, InnoDB + utf8mb4 —
    * `ETL - Faturamento B2B.py:240-251`). */
  def ddlFor(table: String, mapping: SchemaMapping): String = {
    val cols = mapping.specs
      .map(s => s"  `${s.target}` ${mysqlType(s.dataType)} NULL")
      .mkString(",\n")
    s"CREATE TABLE `$table` (\n$cols\n) ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"
  }

  /** Batched INSERT statement (executemany shape,
    * `ETL - Faturamento B2B.py:286-292`). */
  def insertSql(table: String, mapping: SchemaMapping): String = {
    val cols = mapping.specs.map(s => s"`${s.target}`").mkString(", ")
    val marks = mapping.specs.map(_ => "?").mkString(", ")
    s"INSERT INTO `$table` ($cols) VALUES ($marks)"
  }

  /** Reader options for a (optionally range-partitioned) JDBC scan.
    * `query` ships verbatim to the database — the reference's
    * "Query única para performance" pushdown read. */
  def readOptions(
      url: String,
      tableOrQuery: Either[String, String],
      user: String,
      password: String,
      partition: Option[(String, Long, Long, Int)] = None,
      fetchSize: Int = 1000): Map[String, String] = {
    val base = Map(
      "url" -> url,
      "user" -> user,
      "password" -> password,
      "fetchsize" -> fetchSize.toString) ++
      (tableOrQuery match {
        case Left(table)  => Map("dbtable" -> table)
        case Right(query) => Map("query" -> query)
      })
    base ++ partition.fold(Map.empty[String, String]) {
      case (column, lower, upper, n) => Map(
        "partitionColumn" -> column,
        "lowerBound" -> lower.toString,
        "upperBound" -> upper.toString,
        "numPartitions" -> n.toString)
    }
  }

  /** Pushdown read: filters/projections on the returned DataFrame
    * reach the database (Catalyst JDBC pushdown); with `partition`
    * set, N executors each read one key range in parallel. */
  def read(
      spark: SparkSession,
      url: String,
      tableOrQuery: Either[String, String],
      user: String,
      password: String,
      partition: Option[(String, Long, Long, Int)] = None): DataFrame =
    spark.read.format("jdbc")
      .options(readOptions(url, tableOrQuery, user, password, partition))
      .load()

  /** Writer options for the staged-load sink: explicit column types
    * from the mapping, reference batch size, truncate-not-drop on
    * overwrite (the TRUNCATE+INSERT refresh, S13). */
  def writeOptions(
      mapping: SchemaMapping,
      batchSize: Int = 1000,
      truncate: Boolean = true): Map[String, String] = Map(
    "createTableColumnTypes" -> createTableColumnTypes(mapping),
    "batchsize" -> batchSize.toString,
    "truncate" -> truncate.toString,
    "isolationLevel" -> "READ_COMMITTED")

  /** `to_sql(if_exists='replace')` analog: overwrite the staging
    * table with mapping-declared DDL types, inserting in batches. */
  def writeReplace(
      df: DataFrame,
      url: String,
      table: String,
      mapping: SchemaMapping,
      user: String,
      password: String): Unit = {
    val props = new java.util.Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    writeOptions(mapping).foreach { case (k, v) => props.setProperty(k, v) }
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)
  }
}
