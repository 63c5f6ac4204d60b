package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.stream.XMLInputFactory

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal dependency-free XLSX reader/writer — closes the S1/S2
  * Excel-source gap without spark-excel (zero-egress container): an
  * .xlsx file is a ZIP of OOXML parts, and the JDK ships both the ZIP
  * codec and a StAX XML parser, which is all a data-plane reader
  * needs. Scope is deliberately the reference's usage
  * (`pd.read_excel` / `df.to_excel` of typed tabular sheets —
  * `ETL - Faturamento B2B.py:128`, `ETL - CRM.py:67-76`): multi-sheet
  * workbooks, header row, string/number cells. NOT implemented:
  * styling, formulas, date serials (dates travel as ISO strings and
  * cast on the mapping step, like every other text source here).
  *
  * Reader supports the three cell encodings real files use:
  * `t="inlineStr"` (what the writer emits), `t="s"` (sharedStrings
  * table, what Excel itself writes), and numeric/`t="str"` `<v>`
  * values. Sparse rows (missing cells mid-row) are padded by cell
  * reference.
  *
  * Scale note: Excel is an EXPORT/IMPORT format for dims and report
  * deliveries (≤ Excel's own 1M-row sheet cap), not a corpus format —
  * the writer takes driver-local rows exactly like `df.to_excel`.
  * Corpus-scale IO stays on parquet.
  */
object Xlsx {

  // --------------------------------------------------------------- write

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c   => c.toString
  }

  private def colName(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def cellXml(ref: String, v: Any, style: String = ""): String = v match {
    case null                      => ""
    case n @ (_: Long | _: Int | _: Short | _: Byte) =>
      s"""<c r="$ref"$style><v>$n</v></c>"""
    case d: Double                 => s"""<c r="$ref"$style><v>$d</v></c>"""
    case f: Float                  => s"""<c r="$ref"$style><v>$f</v></c>"""
    case d: java.math.BigDecimal   => s"""<c r="$ref"$style><v>${d.toPlainString}</v></c>"""
    case other =>
      s"""<c r="$ref"$style t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>"""
  }

  /** Column display formats for the styled writer (S14 — the
    * reference's xlsxwriter money/percent/date formats,
    * `EDA - Faturamento.py:88-91`). Maps to OOXML numFmt codes. */
  object Fmt {
    val Brl = "\"R$\" #,##0.00"     // fmt_money
    val Percent = "0.00%"           // fmt_perc
    val Date = "yyyy-mm-dd"
    val Int = "#,##0"
  }

  /** Write a workbook: (sheetName, header, rows) per sheet. Strings
    * go as inline strings, numbers as numeric cells. */
  def write(path: String, sheets: Seq[(String, Seq[String], Seq[Seq[Any]])]): Unit =
    writeStyled(path, sheets.map { case (n, h, r) => (n, h, r, Map.empty[Int, String]) })

  /** Styled variant: per sheet, `formats` maps column index → numFmt
    * code (see [[Fmt]]). Emits xl/styles.xml with one cellXf per
    * distinct format and stamps `s=` on the data cells of formatted
    * columns — the formatted-report-sink shape (S14). Values stay
    * raw numerics; formatting is display-only, exactly like
    * xlsxwriter's add_format. */
  def writeStyled(
      path: String,
      sheets: Seq[(String, Seq[String], Seq[Seq[Any]], Map[Int, String])]): Unit = {
    require(sheets.nonEmpty, "xlsx needs at least one sheet")
    // distinct formats across the workbook → custom numFmtIds (164+),
    // cellXf index 0 = unstyled default
    val fmtCodes = sheets.flatMap(_._4.values).distinct
    val numFmtId = fmtCodes.zipWithIndex.map { case (c, i) => c -> (164 + i) }.toMap
    val styleIdx = fmtCodes.zipWithIndex.map { case (c, i) => c -> (i + 1) }.toMap
    val zip = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path)))
    def entry(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    val n = sheets.size
    entry("[Content_Types].xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
         |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
         |<Default Extension="xml" ContentType="application/xml"/>
         |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
         |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
         |${(1 to n).map(i => s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n")}
         |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets>
         |${sheets.zipWithIndex.map { case ((name, _, _, _), i) =>
             s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString("\n")}
         |</sheets>
         |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |${(1 to n).map(i => s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""").mkString("\n")}
         |<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
         |</Relationships>""".stripMargin)
    entry("xl/styles.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<numFmts count="${fmtCodes.size}">
         |${fmtCodes.map(c => s"""<numFmt numFmtId="${numFmtId(c)}" formatCode="${xmlEscape(c)}"/>""").mkString("\n")}
         |</numFmts>
         |<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
         |<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
         |<borders count="1"><border/></borders>
         |<cellXfs count="${fmtCodes.size + 1}">
         |<xf numFmtId="0" applyNumberFormat="0"/>
         |${fmtCodes.map(c => s"""<xf numFmtId="${numFmtId(c)}" applyNumberFormat="1"/>""").mkString("\n")}
         |</cellXfs>
         |</styleSheet>""".stripMargin)
    sheets.zipWithIndex.foreach { case ((_, header, rows, formats), si) =>
      val colStyle: Int => String = ci =>
        formats.get(ci).map(c => styleIdx(c)).filter(_ > 0)
          .map(ix => s""" s="$ix"""").getOrElse("")
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      (header +: rows).zipWithIndex.foreach { case (row, ri) =>
        sb.append(s"""<row r="${ri + 1}">""")
        row.zipWithIndex.foreach { case (v, ci) =>
          // header row stays unstyled; data cells carry the column fmt
          val style = if (ri == 0) "" else colStyle(ci)
          sb.append(cellXml(s"${colName(ci)}${ri + 1}", v, style))
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      entry(s"xl/worksheets/sheet${si + 1}.xml", sb.toString)
    }
    zip.close()
  }

  // ---------------------------------------------------------------- read

  private val relsNs =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  private def parseXml[A](zip: ZipFile, part: String)(
      f: javax.xml.stream.XMLStreamReader => A): A = {
    val entry = zip.getEntry(part)
    require(entry != null, s"missing xlsx part $part")
    val in = zip.getInputStream(entry)
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = factory.createXMLStreamReader(in)
    try f(r) finally { r.close(); in.close() }
  }

  /** Sheet names in workbook order. */
  def sheetNames(path: String): Seq[String] = {
    val zip = new ZipFile(path)
    try sheetTargets(zip).map(_._1)
    finally zip.close()
  }

  private def sheetTargets(zip: ZipFile): Seq[(String, String)] = {
    val rels = parseXml(zip, "xl/_rels/workbook.xml.rels") { r =>
      val m = mutable.Map.empty[String, String]
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship")
          m(r.getAttributeValue(null, "Id")) =
            r.getAttributeValue(null, "Target")
      }
      m.toMap
    }
    parseXml(zip, "xl/workbook.xml") { r =>
      val out = mutable.ArrayBuffer.empty[(String, String)]
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "sheet") {
          val name = r.getAttributeValue(null, "name")
          val rid = r.getAttributeValue(relsNs, "id")
          val target = rels(rid).stripPrefix("/xl/").stripPrefix("./")
          out += name -> s"xl/$target"
        }
      }
      out.toSeq
    }
  }

  private def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    if (zip.getEntry("xl/sharedStrings.xml") == null) return IndexedSeq.empty
    parseXml(zip, "xl/sharedStrings.xml") { r =>
      val out = mutable.ArrayBuffer.empty[String]
      var current: StringBuilder = null
      var inT = false
      while (r.hasNext) r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => current = new StringBuilder
            case "t"  => inT = true
            case _    =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
          if (inT && current != null) current.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "si" => out += current.toString; current = null
            case "t"  => inT = false
            case _    =>
          }
        case _ =>
      }
      out.toIndexedSeq
    }
  }

  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter)
      .foldLeft(0)((a, c) => a * 26 + (c.toUpper - 'A' + 1)) - 1

  /** One sheet as (header, rows-of-nullable-strings), padded by cell
    * reference so sparse rows align. */
  def readSheet(path: String, sheet: String): (Seq[String], Seq[Seq[String]]) = {
    val zip = new ZipFile(path)
    try {
      val target = sheetTargets(zip).toMap.getOrElse(sheet,
        throw new IllegalArgumentException(s"no sheet '$sheet' in $path"))
      val shared = sharedStrings(zip)
      val rows = parseXml(zip, target) { r =>
        val out = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[String]]
        var row: mutable.ArrayBuffer[String] = null
        var cellCol = -1
        var cellType = ""
        var inV = false
        var inIsT = false
        val text = new StringBuilder
        while (r.hasNext) r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "row" => row = mutable.ArrayBuffer.empty[String]
              case "c" =>
                cellCol = Option(r.getAttributeValue(null, "r"))
                  .map(colIndex).getOrElse(row.size)
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
                text.setLength(0)
              case "v" => inV = true
              case "t" => inIsT = true
              case _   =>
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
            if (inV || inIsT) text.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "v" => inV = false
              case "t" => inIsT = false
              case "c" =>
                val value = cellType match {
                  case "s"         => shared(text.toString.trim.toInt)
                  case "inlineStr" => text.toString
                  case _           => text.toString
                }
                while (row.size <= cellCol) row += null
                row(cellCol) = value
              case "row" => out += row; row = null
              case _     =>
            }
          case _ =>
        }
        out.toSeq
      }
      if (rows.isEmpty) (Seq.empty, Seq.empty)
      else {
        val width = rows.map(_.size).max
        val padded = rows.map(r => (r ++ Seq.fill(width - r.size)(null)).toSeq)
        (padded.head.map(h => if (h == null) "" else h), padded.tail)
      }
    } finally zip.close()
  }

  /** Header-promoted DataFrame of one sheet, all columns string —
    * typing happens on the mapping step (SchemaMapping / casts),
    * exactly like the reference's read_excel → COLUMN_MAPPING flow. */
  def read(spark: SparkSession, path: String, sheet: String): DataFrame = {
    val (header, rows) = readSheet(path, sheet)
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val data = new java.util.ArrayList[Row](rows.size)
    rows.foreach(r => data.add(Row.fromSeq(r)))
    spark.createDataFrame(data, schema)
  }
}
