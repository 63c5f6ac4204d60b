package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BrFunctions._

/** Unit tests for the Column-expression cleaning library; edge cases
  * harvested from the reference parsers' branches (SURVEY §5.2). */
class BrFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def evalStr(c: org.apache.spark.sql.Column, input: String): Option[String] =
    Seq(input).toDF("v").select(c.cast("string")).collect()(0).toSeq.headOption
      .flatMap(Option(_)).map(_.toString)

  test("parseBrlMoney handles R$ grouping and decimal comma") {
    assert(evalStr(parseBrlMoney($"v"), "R$ 1.234,56").contains("1234.56"))
    assert(evalStr(parseBrlMoney($"v"), "  12,30").contains("12.30"))
    assert(evalStr(parseBrlMoney($"v"), "").isEmpty)
    assert(evalStr(parseBrlMoney($"v"), "R$ ").isEmpty)
    // no comma → dot IS the decimal point (reference's `if ',' in s` branch)
    assert(evalStr(parseBrlMoney($"v"), "1234.56").contains("1234.56"))
    assert(evalStr(parseBrlMoney($"v"), "R$ 99").contains("99.00"))
  }

  test("parseMoneyLenient is branch-exact with Primeiro Pedido") {
    assert(evalStr(parseMoneyLenient($"v"), "1.234,56").contains("1234.56"))
    // US-style mixed: reference's float() fails → None
    assert(evalStr(parseMoneyLenient($"v"), "1,234.56").isEmpty)
    assert(evalStr(parseMoneyLenient($"v"), "1234.56").contains("1234.56"))
    assert(evalStr(parseMoneyLenient($"v"), "1234,56").contains("1234.56"))
    // thousands-only comma quirk: reference yields 1.234
    assert(evalStr(parseMoneyLenient($"v"), "1,234").contains("1.23"))
  }

  test("formatBrl renders grouping and keeps 2 decimals") {
    assert(evalStr(formatBrl(lit(1234567.5)), "x").contains("R$ 1.234.567,50"))
    assert(evalStr(formatBrl(lit(0.05)), "x").contains("R$ 0,05"))
  }

  test("brl roundtrip: parse(format(x)) == x") {
    val vals = Seq(0.01, 1.0, 999.99, 1000.0, 1234567.89)
    vals.foreach { v =>
      assert(evalStr(parseBrlMoney(formatBrl(lit(v))).cast("double"), "x")
        .contains(v.toString))
    }
  }

  test("cleanDigits keeps digits; empty becomes null; leading zeros survive as string") {
    assert(evalStr(cleanDigitsLong($"v"), "PED-00123/X").contains("123"))
    assert(evalStr(cleanDigitsLong($"v"), "abc").isEmpty)
    assert(evalStr(cleanDigitsStr($"v"), "(011) 9-8765").contains("01198765"))
  }

  test("CNPJ check digits (cnpj_core.py:18-39 semantics)") {
    // 11.444.777/0001-61 is the canonical valid example
    assert(evalStr(isValidCnpj($"v"), "11.444.777/0001-61").contains("true"))
    assert(evalStr(isValidCnpj($"v"), "11.444.777/0001-62").contains("false"))
    assert(evalStr(isValidCnpj($"v"), "11111111111111").contains("false")) // repeated
    assert(evalStr(isValidCnpj($"v"), "123").contains("false"))
    assert(evalStr(formatCnpj(lit("11444777000161")), "x")
      .contains("11.444.777/0001-61"))
  }

  test("month names pt-BR roundtrip, locale-independent") {
    (1 to 12).foreach { m =>
      val name = evalStr(monthNamePt(lit(m)), "x").get
      assert(evalStr(monthNumberPt(lit(name)), "x").contains(m.toString))
    }
    assert(evalStr(monthNamePt(lit(3)), "x").contains("MARÇO"))
    assert(evalStr(monthNumberPt(lit(" fevereiro ")), "x").contains("2"))
    assert(evalStr(monthNumberPt(lit("SMARCH")), "x").isEmpty)
  }

  test("simNaoToInt is branch-exact with Painel de Oportunidades") {
    Seq("Sim" -> "1", "TRUE" -> "1", "1" -> "1",
      "Não" -> "0", "FALSE" -> "0", "0" -> "0", "" -> "0",
      // not in either list and not numeric → 0 (to_numeric coerce + fillna(0))
      " não " -> "0", "Y" -> "0",
      // numeric passthrough, truncated like astype(int)
      "3" -> "3", "3.9" -> "3").foreach { case (in, out) =>
      assert(evalStr(simNaoToInt(lit(in)), "x").contains(out), s"input $in")
    }
    // reference: NaN → 'NAN' string → to_numeric fails → fillna(0)
    assert(evalStr(simNaoToInt(lit(null).cast("string")), "x").contains("0"))
  }

  test("leadTimeHms pads and carries hours past 24") {
    assert(evalStr(leadTimeHms(lit(3661L)), "x").contains("01:01:01"))
    assert(evalStr(leadTimeHms(lit(90061L)), "x").contains("25:01:01"))
    assert(evalStr(leadTimeHms(lit(0L)), "x").contains("00:00:00"))
  }

  test("safeDiv yields null on zero/null denominator") {
    assert(evalStr(safeDiv(lit(10.0), lit(0.0)), "x").isEmpty)
    assert(evalStr(safeDiv(lit(10.0), lit(4.0)), "x").contains("2.5"))
  }

  test("percentParse strips % and casts") {
    assert(evalStr(percentParse(lit("12.34%")).cast("double"), "x").contains("12.34"))
    assert(evalStr(percentParse(lit("")), "x").isEmpty)
  }

  test("weekOfMonthLabel matches the first-Monday formula") {
    // 2024-01-01 is a Monday → first Monday = day 1
    assert(evalStr(weekOfMonthLabel(to_date(lit("2024-01-01"))), "x")
      .contains("Semana 1"))
    assert(evalStr(weekOfMonthLabel(to_date(lit("2024-01-07"))), "x")
      .contains("Semana 1")) // still within the first Monday week
    assert(evalStr(weekOfMonthLabel(to_date(lit("2024-01-08"))), "x")
      .contains("Semana 2"))
    // 2024-06-01 is a Saturday → days before first Monday (Jun 3) = Semana 0
    assert(evalStr(weekOfMonthLabel(to_date(lit("2024-06-01"))), "x")
      .contains("Semana 0"))
    assert(evalStr(weekOfMonthLabel(to_date(lit("2024-06-03"))), "x")
      .contains("Semana 1"))
    assert(evalStr(quarterLabel(to_date(lit("2024-05-15"))), "x")
      .contains("2 Trimestre 2024"))
  }

  test("classifyContains first-match-wins ladder") {
    val rules = Seq("ATIVO" -> "ATIVO", "PASSIVO" -> "PASSIVO")
    assert(evalStr(classifyContains(lit("conta do ativo circulante"), rules, "OUTRO"), "x")
      .contains("ATIVO"))
    assert(evalStr(classifyContains(lit("sem categoria"), rules, "OUTRO"), "x")
      .contains("OUTRO"))
  }

  test("repairEncoding fixes utf8-as-cp1252 mojibake byte-exactly") {
    import graft.functions.EncodingRepair.repairEncoding
    def corrupt(good: String): String =
      new String(good.getBytes("UTF-8"), "windows-1252")
    for (good <- Seq("ção", "Informação", "Preço único", "ergonômico",
        "SÃO PAULO — CAFÉ", "ÉÓÚ àêõü")) {
      assert(repairEncoding(corrupt(good)) == good, s"repair of <$good>")
      // clean accents must pass through the identity leg untouched
      assert(repairEncoding(good) == good, s"identity of <$good>")
    }
    // 'Á'/'Í' have UTF-8 second bytes 0x81/0x8D — UNDEFINED in cp1252,
    // so that mis-decode is lossy (U+FFFD) and unrepairable in any
    // engine; the real-world corruption for them is the latin-1
    // mis-decode, which the fallback leg repairs
    for (good <- Seq("ÁGUA", "MÍNIMO", "ÁÉÍÓÚ àêõü")) {
      val broken = new String(good.getBytes("UTF-8"), "ISO-8859-1")
      assert(repairEncoding(broken) == good, s"latin-1 repair of <$good>")
    }
  }

  test("property: repairEncoding inverts cp1252 mis-decoding for random pt-BR text") {
    import graft.functions.EncodingRepair.repairEncoding
    import org.scalacheck.Gen
    // chars whose UTF-8 continuation bytes are cp1252-DEFINED (so the
    // mis-decode is lossless and therefore repairable) — the pt-BR
    // alphabet minus Á/Í-class chars (0x81/0x8D are undefined slots)
    val chars = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('ç', 'ã', 'é', 'ê', 'õ', 'ô', 'ú', 'Ã', 'É', 'Ç'),
      1 -> Gen.const(' '))
    val strs = Gen.listOfN(200, Gen.listOf(chars).map(_.mkString)).sample.get
    strs.foreach { good =>
      val broken = new String(good.getBytes("UTF-8"), "windows-1252")
      assert(repairEncoding(broken) == good, s"<$good>")
      assert(repairEncoding(good) == good, s"identity <$good>")
    }
  }

  test("repairEncoding identity edge cases") {
    import graft.functions.EncodingRepair.repairEncoding
    assert(repairEncoding(null) == null)
    assert(repairEncoding("") == "")
    assert(repairEncoding("plain ascii 123") == "plain ascii 123")
    // char outside cp1252 AND latin-1 (→ both encode legs fail): identity
    assert(repairEncoding("日本語 text") == "日本語 text")
    // iso-8859-1 fallback leg: Cyrillic 'р' is UTF-8 D1 80; mis-decoded
    // as LATIN-1 that yields "Ñ" + U+0080, and U+0080 is NOT
    // cp1252-encodable in the JVM (0x80 is '€' there) — so leg 1
    // REPORTs and only the latin-1 round-trip can repair it
    val good = "\u0440"
    val broken = new String(good.getBytes("UTF-8"), "ISO-8859-1")
    assert(broken == "\u00d1\u0080")
    assert(repairEncoding(broken) == good)
  }
}
