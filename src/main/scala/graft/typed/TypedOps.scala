package graft.typed

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import graft.core.Tables

/** Typed `Dataset[T]` surface for the fixed fixture tables — compile-
  * time field checks where the schema is static (SURVEY §1.1 Spark
  * mapping: case classes for the fixed test-fixture tables, DataFrame
  * everywhere schemas are dynamic).
  */
object TypedOps {

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.time.LocalDateTime,
      o_orderpriority: String)

  final case class CustomerOrders(custkey: Long, pedidos: Long, total: BigDecimal)

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, dir).as[Order]
  }

  /** Exact-decimal control-total aggregator (Aggregator[IN,BUF,OUT],
    * SURVEY §2.12): count + DECIMAL-exact sum in one pass — the typed
    * twin of `Det.dsum`, usable with `groupByKey(...).agg(...)`. */
  final case class Totals(n: Long, sum: BigDecimal)

  class ControlTotal extends Aggregator[Order, Totals, Totals] {
    override def zero: Totals = Totals(0L, BigDecimal(0).setScale(2))
    override def reduce(b: Totals, o: Order): Totals =
      Totals(b.n + 1, b.sum + BigDecimal(o.o_totalprice).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    override def merge(a: Totals, b: Totals): Totals = Totals(a.n + b.n, a.sum + b.sum)
    override def finish(r: Totals): Totals = r
    override def bufferEncoder: Encoder[Totals] = Encoders.product[Totals]
    override def outputEncoder: Encoder[Totals] = Encoders.product[Totals]
  }

  /** Per-customer order count + exact total through the typed API. */
  def perCustomerTotals(spark: SparkSession, dir: String): Dataset[CustomerOrders] = {
    import spark.implicits._
    orders(spark, dir)
      .groupByKey(_.o_custkey)
      .agg(new ControlTotal().toColumn.name("totals"))
      .map { case (ck, t) => CustomerOrders(ck, t.n, t.sum) }
  }

  /** Typed filter+map chain — still a Catalyst plan (Encoders keep the
    * fields visible to the optimizer for pruning at the scan). */
  def urgentRevenue(spark: SparkSession, dir: String): Dataset[(Long, Double)] = {
    import spark.implicits._
    orders(spark, dir)
      .filter(o => o.o_orderpriority == "1-URGENT")
      .map(o => (o.o_orderkey, o.o_totalprice))
  }
}
