package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.ReportsShowroom

/** Invariants of the showroom report ports the DuckDB compare can't
  * see: full-outer alignment semantics, display grammar, total rows. */
class ReportsShowroomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("r17: full outer keeps dangling days, S/ Data marks them") {
    val rows = ReportsShowroom.r17ShowroomComparativo(spark, sf).collect()
    assert(rows.last.getAs[String]("dia") == "Total Geral")
    assert(rows.last.getAs[String]("data_a") == "-")
    val detail = rows.dropRight(1)
    // event A (1998) has more sale days than event B (1999) in this
    // data, so B's side must show unmatched rows
    assert(detail.exists(_.getAs[String]("data_b") == "S/ Data"))
    // every unmatched side displays R$ 0,00 and its growth guard
    detail.filter(_.getAs[String]("data_a") == "S/ Data").foreach { r =>
      assert(r.getAs[String]("evento_a") == "R$ 0,00")
      assert(r.getAs[String]("cresc_dia") == "0%")
    }
    val money = """R\$ \d{1,3}(\.\d{3})*,\d{2}""".r
    rows.foreach { r =>
      assert(money.matches(r.getAs[String]("evento_a")))
      assert(money.matches(r.getAs[String]("evento_b")))
    }
  }

  test("r18: total row says 100,00% and sums the counts") {
    val rows = ReportsShowroom.r18DevolucaoPct(spark, sf).collect()
    val total = rows.filter(_.getAs[String]("motivo") == "TOTAL GERAL")
    assert(total.length == 1)
    assert(total.head.getAs[String]("pct_repres") == "100,00%")
    val detail = rows.filter(_.getAs[String]("motivo") != "TOTAL GERAL")
    assert(detail.map(_.getAs[Long]("qtde")).sum ==
      total.head.getAs[Long]("qtde"))
    val pctDe = """\d{1,3}(\.\d{3})*,\d{2}%""".r
    detail.foreach(r => assert(pctDe.matches(r.getAs[String]("pct_repres"))))
  }

  test("r19: weekday names match the date") {
    val rows = ReportsShowroom.r19VendidoSemana(spark, sf).collect()
    assert(rows.nonEmpty)
    val names = graft.functions.BrFunctions.weekdaysPt
    rows.foreach { r =>
      val d = r.getAs[java.sql.Date]("data_venda").toLocalDate
      // java DayOfWeek: Monday=1..Sunday=7 → MySQL DAYOFWEEK 1=Sunday
      val mysqlDow = d.getDayOfWeek.getValue % 7 + 1
      assert(r.getAs[String]("dia_semana") == names(mysqlDow - 1))
    }
  }
}
