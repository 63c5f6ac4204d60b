package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.typed.TypedOps

/** Typed Dataset surface: results must equal the untyped plans. */
class TypedOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("typed per-customer totals equal untyped aggregation") {
    val typed = TypedOps.perCustomerTotals(spark, sf)
      .toDF("custkey", "pedidos", "total")
    val untyped = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("pedidos"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
    val joined = typed.as("a").join(untyped.as("b"), Seq("custkey"))
    assert(typed.count() == untyped.count())
    assert(joined.filter(col("a.pedidos") =!= col("b.pedidos")).count() == 0)
    assert(joined.filter(col("a.total") =!= col("b.total")).count() == 0)
  }

  test("typed filter+map equals untyped filter+select") {
    val typed = TypedOps.urgentRevenue(spark, sf).toDF("k", "v")
    val untyped = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    assert(typed.count() == untyped.count())
    assert(typed.exceptAll(untyped).count() == 0)
  }

  test("Profiler approximate path stays within HLL error of exact") {
    val exact = graft.profiling.Profiler.profile(Tables.orders(spark, sf))
    val approx = graft.profiling.Profiler.profile(Tables.orders(spark, sf), exact = false)
    exact.zip(approx).foreach { case (e, a) =>
      assert(e.name == a.name)
      if (e.distinct > 0) {
        val err = math.abs(a.distinct - e.distinct).toDouble / e.distinct
        assert(err < 0.1, s"${e.name}: approx ${a.distinct} vs exact ${e.distinct}")
      }
    }
  }
}
