package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.core.{ColumnSpec, SchemaMapping}
import graft.etl.JdbcIo

/** No database in the container — these pin the generated DDL/SQL
  * strings and the reader/writer option plumbing (the parts that ARE
  * testable offline; load semantics ride the parquet carriers). */
class JdbcIoSpec extends AnyFunSuite {

  private val mapping = SchemaMapping.of(
    ColumnSpec("Pedido", "pedido_id", LongType),
    ColumnSpec("Valor Total", "valor_total", DecimalType(15, 2)),
    ColumnSpec("Data Negociação", "data_negociacao", TimestampType),
    ColumnSpec("Status NFe", "status_nfe", StringType),
    ColumnSpec("Qtd", "qtd", IntegerType))

  test("type mapping mirrors the reference DDL conversion") {
    assert(JdbcIo.mysqlType(DecimalType(15, 2)) == "DECIMAL(15,2)")
    assert(JdbcIo.mysqlType(LongType) == "BIGINT")
    assert(JdbcIo.mysqlType(TimestampType) == "DATETIME")
    assert(JdbcIo.mysqlType(StringType) == "VARCHAR(255)")
    assert(JdbcIo.mysqlType(BooleanType) == "TINYINT(1)")
    // unmapped types fall back like the reference's String(255) default
    assert(JdbcIo.mysqlType(ArrayType(LongType)) == "VARCHAR(255)")
  }

  test("ddlFor emits the reference's explicit CREATE TABLE shape") {
    val ddl = JdbcIo.ddlFor("stg_faturamento_b2b", mapping)
    assert(ddl.startsWith("CREATE TABLE `stg_faturamento_b2b` ("))
    assert(ddl.contains("`pedido_id` BIGINT NULL"))
    assert(ddl.contains("`valor_total` DECIMAL(15,2) NULL"))
    assert(ddl.contains("`data_negociacao` DATETIME NULL"))
    assert(ddl.endsWith("ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"))
    // mapping order is preserved (executemany relies on it)
    val order = Seq("pedido_id", "valor_total", "data_negociacao",
      "status_nfe", "qtd").map(c => ddl.indexOf(s"`$c`"))
    assert(order == order.sorted && order.forall(_ >= 0))
  }

  test("insertSql matches the executemany statement") {
    assert(JdbcIo.insertSql("t", mapping) ==
      "INSERT INTO `t` (`pedido_id`, `valor_total`, `data_negociacao`, " +
        "`status_nfe`, `qtd`) VALUES (?, ?, ?, ?, ?)")
  }

  test("createTableColumnTypes covers every mapped column in order") {
    assert(JdbcIo.createTableColumnTypes(mapping) ==
      "pedido_id BIGINT, valor_total DECIMAL(15,2), " +
        "data_negociacao DATETIME, status_nfe VARCHAR(255), qtd INT")
  }

  test("readOptions: plain table, pushdown query, range partitioning") {
    val plain = JdbcIo.readOptions("jdbc:mysql://h/db", Left("orders"), "u", "p")
    assert(plain("dbtable") == "orders" && !plain.contains("query"))
    assert(plain("fetchsize") == "1000")

    val q = "SELECT * FROM t WHERE status_nfe = 'Aprovada'"
    val pushed = JdbcIo.readOptions("jdbc:mysql://h/db", Right(q), "u", "p")
    assert(pushed("query") == q && !pushed.contains("dbtable"))

    val part = JdbcIo.readOptions("jdbc:mysql://h/db", Left("orders"), "u", "p",
      partition = Some(("o_orderkey", 0L, 6000000L, 32)))
    assert(part("partitionColumn") == "o_orderkey")
    assert(part("lowerBound") == "0" && part("upperBound") == "6000000")
    assert(part("numPartitions") == "32")
  }

  test("writeOptions: typed DDL, reference batch size, truncate refresh") {
    val o = JdbcIo.writeOptions(mapping)
    assert(o("batchsize") == "1000") // BATCH_SIZE = 1000 in the reference
    assert(o("truncate") == "true")  // S13: TRUNCATE+INSERT, not DROP
    assert(o("createTableColumnTypes").contains("valor_total DECIMAL(15,2)"))
  }
}
