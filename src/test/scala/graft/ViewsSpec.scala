package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-text surface: fixture tables as temp views for `spark.sql`. */
class ViewsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("registered views answer reference-shaped SQL") {
    graft.core.Views.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus, SUM(l_quantity) AS sum_qty
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""").collect()
    val viaDf = graft.queries.Aggregations.q1Agg(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty")
      .orderBy("l_returnflag", "l_linestatus").collect()
    assert(viaSql.map(r => (r.get(0), r.get(1), r.get(2))).toSeq ==
      viaDf.map(r => (r.get(0), r.get(1), r.get(2))).toSeq)
    assert(spark.sql("SELECT COUNT(*) FROM documents").first().getLong(0) > 0)
    assert(spark.sql("SELECT COUNT(*) FROM events").first().getLong(0) > 0)
  }
}
