package graft.pipeline

import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal dependency-free XLSX writer (OOXML = a zip of XML parts):
  * enough of SpreadsheetML for the reference's Excel export — multiple
  * named sheets, a header row, inline strings and typed numeric cells.
  * Readable by Excel, LibreOffice, pandas/openpyxl.
  *
  * An .xlsx is inherently a DRIVER-SIDE report artifact (single file,
  * 1,048,576-row format limit — nothing about it distributes), so the
  * caller collects a bounded row set; the distributed sinks (parquet,
  * CSV, JDBC) remain the data paths.
  *
  * Mirrors carga.py:61-88 (`exportar_a_excel`): sheet 'Datos' with the
  * frame, sheet 'Resumen' with Métrica/Valor rows.
  */
object Xlsx {

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c >= ' ' || c == '\t' || c == '\n' || c == '\r' => sb.append(c)
      case _ => () // control chars are invalid in XML 1.0
    }
    sb.toString
  }

  /** 0-based column index → A1-style letters (0→A, 25→Z, 26→AA). */
  private def colRef(i: Int): String = {
    var n = i
    val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  /** Cell typed by the VALUE's runtime class — numeric JVM types (what
    * Spark Rows carry for numeric schema types) become `t="n"`, everything
    * else an inline string. This is openpyxl's rule, and it means
    * numeric-LOOKING strings ('007', 16+-digit ids) stay strings instead
    * of being silently renormalized by Excel. Non-finite doubles have no
    * numeric-cell representation → stringified. */
  private def cell(ref: String, v: Any): String = v match {
    case null =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve"></t></is></c>"""
    case d: Double if d.isNaN || d.isInfinite =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(d.toString)}</t></is></c>"""
    case f: Float if f.isNaN || f.isInfinite =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(f.toString)}</t></is></c>"""
    case n @ (_: java.lang.Number | _: scala.math.BigDecimal | _: scala.math.BigInt) =>
      s"""<c r="$ref" t="n"><v>$n</v></c>"""
    case b: Boolean =>
      s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case s =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(s.toString)}</t></is></c>"""
  }

  private def sheetXml(rows: Seq[Seq[Any]]): String = {
    val body = rows.zipWithIndex.map { case (r, ri) =>
      val cells = r.zipWithIndex.map { case (v, ci) => cell(s"${colRef(ci)}${ri + 1}", v) }
      s"""<row r="${ri + 1}">${cells.mkString}</row>"""
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
  }

  /** Write `sheets` (name → header+rows) as one .xlsx at `path`. */
  def write(path: String, sheets: Seq[(String, Seq[Seq[Any]])]): Unit = {
    val contentTypes =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
${sheets.indices.map(i => s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString("\n")}
</Types>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""
    val workbook =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>${sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString}</sheets>
</workbook>"""
    val workbookRels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
${sheets.indices.map(i => s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString("\n")}
</Relationships>"""

    val out = new ZipOutputStream(Files.newOutputStream(Paths.get(path)))
    def entry(name: String, content: String): Unit = {
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.closeEntry()
    }
    try {
      entry("[Content_Types].xml", contentTypes)
      entry("_rels/.rels", rootRels)
      entry("xl/workbook.xml", workbook)
      entry("xl/_rels/workbook.xml.rels", workbookRels)
      sheets.zipWithIndex.foreach { case ((_, rows), i) =>
        entry(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(rows))
      }
    } finally out.close()
  }
}
