package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.ReportsSmt

/** Invariants of the SMT report-family ports (queries/ReportsSmt) that
  * the DuckDB hash compare can't see: display-string grammar, LIMIT
  * determinism, rollup-total semantics. */
class ReportsSmtSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private val pctRe = """-?\d{1,3}(,\d{3})*\.\d{2}%""".r

  test("r7 MoM: 12 months, first-month lag crosses the year boundary") {
    val rows = ReportsSmt.r7ReparosMom(spark, sf).collect()
    assert(rows.length == 12)
    val jan = rows.head
    assert(jan.getAs[String]("mes") == "JANEIRO")
    // January's 'anterior' is December of the PREVIOUS year (window
    // before the p_ano filter), so it must be non-zero in this data
    assert(jan.getAs[Long]("qtd_anterior") > 0)
    rows.foreach { r =>
      assert(pctRe.matches(r.getAs[String]("crescimento_pct")),
        s"bad pct: ${r.getAs[String]("crescimento_pct")}")
      assert(r.getAs[Long]("dif_absoluta") ==
        r.getAs[Long]("qtd_atual") - r.getAs[Long]("qtd_anterior"))
    }
  }

  test("r8 YoY: lag jumps to same month previous year") {
    val mensal = ReportsSmt.r8ReparosYoy(spark, sf).collect()
    assert(mensal.length == 12)
    // spot-check January: qtd_ano_anterior == count of JANEIRO/1996
    val janPrev = graft.core.Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.expr(
        "YEAR(l_shipdate) = 1996 AND MONTH(l_shipdate) = 1")).count()
    assert(mensal.head.getAs[Long]("qtd_ano_anterior") == janPrev)
  }

  test("top10 template: deterministic 10 rows, pct strings, both branches") {
    val acoes = ReportsSmt.r9Top10Acoes(spark, sf).collect()
    assert(acoes.length == 10)
    assert(acoes.forall(_.getAs[String]("mes") == "ACUMULADO"))
    // sorted by qtd desc with full tiebreak → re-running is identical
    val again = ReportsSmt.r9Top10Acoes(spark, sf).collect()
    assert(acoes.map(_.toString).toSeq == again.map(_.toString).toSeq)
    val forn = ReportsSmt.r10Top10Fornecedores(spark, sf).collect()
    assert(forn.forall(_.getAs[String]("mes") == "JANEIRO"))
    assert(forn.forall(r =>
      r.getAs[String]("pct_sob_total").endsWith("%")))
  }

  test("r12 RMA rollup: total row re-counts distinct technicians") {
    val rows = ReportsSmt.r12SnippetRma(spark, sf).collect()
    val total = rows.filter(_.getAs[String]("ano") == "TOTAL GERAL")
    assert(total.length == 1)
    val perYear = rows.filter(_.getAs[String]("ano") != "TOTAL GERAL")
    // the grand-total technician count is a global COUNT(DISTINCT),
    // NOT the sum of per-year counts (same technician works many years)
    assert(total.head.getAs[Long]("tecnicos_ativos") <
      perYear.map(_.getAs[Long]("tecnicos_ativos")).sum)
    assert(total.head.getAs[Long]("qtd_total") ==
      perYear.map(_.getAs[Long]("qtd_total")).sum)
    // total-last ordering via the g twin
    assert(rows.last.getAs[String]("ano") == "TOTAL GERAL")
  }

  test("scrap: entry floor + scrap>0 hold, both sort branches populated") {
    val sku = ReportsSmt.r14ScrapSku(spark, sf).collect()
    assert(sku.nonEmpty)
    sku.foreach { r =>
      assert(r.getAs[Long]("entradas") > 5)
      val scrap = r.getAs[Long]("total_scrap")
      assert(scrap > 0 && scrap <= r.getAs[Long]("entradas"))
      assert(r.getAs[String]("pct_de_scrap").endsWith("%"))
    }
    // TUDO branch: chronological — mes_n non-decreasing in output order
    val meses = sku.map(_.getAs[Int]("mes_n")).toSeq
    assert(meses == meses.sorted)
    // month branch: single month, ratio-descending
    val peca = ReportsSmt.r15ScrapPorPeca(spark, sf).collect()
    assert(peca.nonEmpty && peca.forall(_.getAs[String]("mes") == "MARÇO"))
    val ratios = peca.map(r =>
      r.getAs[Long]("total_scrap").toDouble / r.getAs[Long]("entradas")).toSeq
    assert(ratios == ratios.sorted.reverse)
  }

  test("r16 YearToYear: 12 months + total row, de_DE display grammar") {
    val rows = graft.queries.Reports.r16CenarioYty(spark, sf).collect()
    assert(rows.length == 13)
    val total = rows.last
    assert(total.getAs[String]("mes") == "TOTAL GERAL/MÉDIA")
    assert(total.getAs[Int]("mes_num") == 13)
    val moneyRe = """R\$ -?\d{1,3}(\.\d{3})*,\d{2}""".r
    val pctRe = """(-?\d{1,3}(\.\d{3})*,\d{2}%|N/A)""".r
    rows.foreach { r =>
      Seq("1997", "1998", "1999", "2000", "rob_du_2000").foreach(c =>
        assert(moneyRe.matches(r.getAs[String](c)), s"$c: ${r.getAs[String](c)}"))
      Seq("cresc_98_97", "cresc_99_98", "cresc_00_99").foreach(c =>
        assert(pctRe.matches(r.getAs[String](c)), s"$c: ${r.getAs[String](c)}"))
    }
  }

  test("r13 reincidencia: every row repeats and chains are sorted") {
    val rows = ReportsSmt.r13ReincidenciaReparos(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("reincidencia") > 1)
      val techs = r.getAs[String]("tecnicos").split(" -> ").toSeq
      assert(techs == techs.sorted)
      assert(!r.getAs[java.sql.Date]("primeira_entrada")
        .after(r.getAs[java.sql.Date]("ultima_entrada")))
    }
  }
}
