package graft

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Xlsx

/** The s1 oracle proves the writer→reader round trip on clean data;
  * this spec covers the awkward parts: XML escaping, unicode, sparse
  * rows, multi-sheet order, and Excel's OWN cell encoding
  * (sharedStrings) which our writer never emits but real files use. */
class XlsxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(name: String): String =
    Files.createTempDirectory("xlsx-spec").resolve(name).toString

  test("round trip preserves strings, numbers, escaping, unicode") {
    val path = tmp("t.xlsx")
    val rows = Seq(
      Seq[Any](1L, "a & b < c > \"d\"", 1.5),
      Seq[Any](2L, "ação São Paulo — café", -0.25),
      Seq[Any](3L, "", 1234567.89))
    Xlsx.write(path, Seq(("Plan1", Seq("id", "txt", "val"), rows)))
    val (header, back) = Xlsx.readSheet(path, "Plan1")
    assert(header == Seq("id", "txt", "val"))
    assert(back.map(_(1)) == rows.map(_(1)))
    assert(back.map(_(0).toLong) == Seq(1L, 2L, 3L))
    assert(back.map(_(2).toDouble) == Seq(1.5, -0.25, 1234567.89))
  }

  test("null cells are skipped on write and padded on read") {
    val path = tmp("sparse.xlsx")
    Xlsx.write(path, Seq(("S", Seq("a", "b", "c"),
      Seq(Seq[Any](1L, null, "x"), Seq[Any](null, 2L, null)))))
    val (_, back) = Xlsx.readSheet(path, "S")
    assert(back == Seq(Seq("1", null, "x"), Seq(null, "2", null)))
  }

  test("multi-sheet workbook keeps order and names") {
    val path = tmp("multi.xlsx")
    Xlsx.write(path, Seq(
      ("Zeta", Seq("k"), Seq(Seq[Any]("z"))),
      ("Alpha", Seq("k"), Seq(Seq[Any]("a")))))
    assert(Xlsx.sheetNames(path) == Seq("Zeta", "Alpha"))
    assert(Xlsx.readSheet(path, "Alpha")._2 == Seq(Seq("a")))
  }

  test("reads Excel-style sharedStrings cells our writer never emits") {
    // hand-build a workbook the way Excel itself encodes strings:
    // t="s" cells indexing xl/sharedStrings.xml (with a rich-text run)
    val path = tmp("shared.xlsx")
    val zip = new ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(n: String, c: String): Unit = {
      zip.putNextEntry(new ZipEntry(n)); zip.write(c.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Dados" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2"><si><t>nome</t></si><si><r><t>João </t></r><r><t>Silva</t></r></si></sst>""")
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c></row><row r="2"><c r="A2" t="s"><v>1</v></c></row></sheetData></worksheet>""")
    zip.close()
    val (header, rows) = Xlsx.readSheet(path, "Dados")
    assert(header == Seq("nome"))
    assert(rows == Seq(Seq("João Silva"))) // rich-text runs concatenate
  }

  test("styled report sink: numFmts land in styles.xml, cells reference them") {
    val path = tmp("styled.xlsx")
    Xlsx.writeStyled(path, Seq(("Relatório", Seq("sku", "valor", "share"),
      Seq(Seq[Any]("A1", 1234.5, 0.25), Seq[Any]("B2", 99.99, 0.75)),
      Map(1 -> Xlsx.Fmt.Brl, 2 -> Xlsx.Fmt.Percent))))
    def part(name: String): String = {
      val z = new java.util.zip.ZipFile(path)
      try new String(z.getInputStream(z.getEntry(name)).readAllBytes, "UTF-8")
      finally z.close()
    }
    val styles = part("xl/styles.xml")
    assert(styles.contains("&quot;R$&quot; #,##0.00"))
    assert(styles.contains("0.00%"))
    val sheet = part("xl/worksheets/sheet1.xml")
    // data cells of formatted columns carry s=; header row does not
    assert(sheet.contains("""<c r="B2" s="1"><v>1234.5</v></c>"""))
    assert(sheet.contains("""<c r="C3" s="2"><v>0.75</v></c>"""))
    assert(sheet.contains("""<c r="B1" t="inlineStr">"""))
    // values stay raw — the round trip reads the same numbers back
    val (_, rows) = Xlsx.readSheet(path, "Relatório")
    assert(rows.map(_(1).toDouble) == Seq(1234.5, 99.99))
  }

  test("property: round trip is identity for arbitrary strings and numbers") {
    import org.scalacheck.Gen
    val path = tmp("prop.xlsx")
    // printable-ish unicode including XML specials and accents; keep
    // out raw control chars (illegal in XML 1.0, Excel rejects them too)
    val charGen = Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('&', '<', '>', '"', '\'', ' ', 'ç', 'ã', 'É', '—', '€'))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val rows = Gen.listOfN(120,
      Gen.zip(Gen.choose(Long.MinValue, Long.MaxValue), strGen,
        Gen.choose(-1e12, 1e12))).sample.get
      .map { case (l, s, d) => Seq[Any](l, s, d) }
    Xlsx.write(path, Seq(("P", Seq("l", "s", "d"), rows)))
    val (_, back) = Xlsx.readSheet(path, "P")
    assert(back.size == rows.size)
    rows.zip(back).foreach { case (orig, got) =>
      assert(got(0).toLong == orig(0))
      assert(got(1) == orig(1), s"string <${orig(1)}>")
      assert(got(2).toDouble == orig(2))
    }
  }

  test("wide sheets round trip past column Z (AA.. refs)") {
    val path = tmp("wide.xlsx")
    val width = 60 // through AA..BH
    val header = (0 until width).map(i => s"c$i")
    val row = (0 until width).map(i => s"v$i": Any)
    Xlsx.write(path, Seq(("W", header, Seq(row))))
    val (h, rows) = Xlsx.readSheet(path, "W")
    assert(h == header)
    assert(rows == Seq((0 until width).map(i => s"v$i")))
  }

  test("header-promoted DataFrame matches sheet content") {
    val path = tmp("df.xlsx")
    Xlsx.write(path, Seq(("S", Seq("k", "v"),
      Seq(Seq[Any](1L, "um"), Seq[Any](2L, "dois")))))
    val df = Xlsx.read(spark, path, "S")
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("1", "um"), ("2", "dois")))
  }
}
