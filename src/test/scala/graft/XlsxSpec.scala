package graft

import graft.pipeline.Sinks
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** S6 Excel sink: the reference's exportar_a_excel shape (carga.py:61-88)
  * — Datos + Resumen sheets, yyyyMMdd_HHmm filename stamp, empty-frame
  * skip — from the dependency-free OOXML writer. */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private def readEntry(zf: ZipFile, name: String): String = {
    val e = zf.getEntry(name)
    assert(e != null, s"missing zip part $name")
    new String(zf.getInputStream(e).readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
  }

  test("xlsx sink writes a valid two-sheet OOXML package") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    val df = Seq((1L, "Casa <&> \"centro\"", 1234.5), (2L, "Loft", 99.0), (3L, null: String, 0.25))
      .toDF("id", "nombre", "precio")
    val path = Sinks.xlsx(df, dir, "listings",
      exportedAt = () => "2026-08-12 00:00:00", fileStamp = () => "20260812_0000").get
    assert(path.endsWith("listings_transformado_20260812_0000.xlsx"))
    val zf = new ZipFile(path)
    try {
      // all five mandatory parts present
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml",
        "xl/worksheets/sheet2.xml").subsetOf(names))
      val wb = readEntry(zf, "xl/workbook.xml")
      assert(wb.contains("""name="Datos"""") && wb.contains("""name="Resumen""""))
      val datos = readEntry(zf, "xl/worksheets/sheet1.xml")
      // header row, escaped inline string, typed numeric cell
      assert(datos.contains("<t xml:space=\"preserve\">nombre</t>"))
      assert(datos.contains("Casa &lt;&amp;&gt; &quot;centro&quot;"))
      assert(datos.contains("""<c r="C2" t="n"><v>1234.5</v></c>"""))
      val resumen = readEntry(zf, "xl/worksheets/sheet2.xml")
      assert(resumen.contains("Total de registros"))
      assert(resumen.contains("""<c r="B2" t="n"><v>3</v></c>""")) // full count
      assert(resumen.contains("2026-08-12 00:00:00"))
    } finally zf.close()
  }

  test("cells typed by schema value, not by look: '007' and 16-digit id strings stay strings") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx4").toString
    val df = Seq(("007", "1234567890123456789", 7L)).toDF("code", "ext_id", "n")
    val path = Sinks.xlsx(df, dir, "typed",
      exportedAt = () => "t", fileStamp = () => "s").get
    val zf = new ZipFile(path)
    try {
      val datos = readEntry(zf, "xl/worksheets/sheet1.xml")
      // numeric-looking STRING values survive as inline strings (Excel
      // would strip the leading zero / round past 15 digits otherwise)
      assert(datos.contains("""<c r="A2" t="inlineStr"><is><t xml:space="preserve">007</t></is></c>"""))
      assert(datos.contains(
        """<c r="B2" t="inlineStr"><is><t xml:space="preserve">1234567890123456789</t></is></c>"""))
      // the genuinely numeric column is a numeric cell
      assert(datos.contains("""<c r="C2" t="n"><v>7</v></c>"""))
    } finally zf.close()
  }

  test("empty frame is skipped with None, like carga.py's empty-DataFrame warning") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx5").toString
    val df = Seq((1L, "x")).toDF("id", "v").filter("id < 0")
    assert(Sinks.xlsx(df, dir, "vacio", exportedAt = () => "t", fileStamp = () => "s").isEmpty)
    assert(!java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().hasNext)
  }

  test("xlsx column refs roll over past Z (27th column is AA)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx3").toString
    val wide = (1 to 28).map(i => s"c$i")
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row.fromSeq(wide.map(c => s"v_$c"))),
      org.apache.spark.sql.types.StructType(wide.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType))))
    val path = Sinks.xlsx(df, dir, "wide", exportedAt = () => "t", fileStamp = () => "s").get
    val zf = new ZipFile(path)
    try {
      val datos = readEntry(zf, "xl/worksheets/sheet1.xml")
      assert(datos.contains("<c r=\"AA1\"") && datos.contains("<c r=\"AB1\""))
      assert(datos.contains("v_c27") && datos.contains("v_c28"))
    } finally zf.close()
  }

  test("xlsx data sheet truncates at maxRows but Resumen keeps the full count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx2").toString
    val df = (1 to 50).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    val path = Sinks.xlsx(df, dir, "big", maxRows = 10,
      exportedAt = () => "t", fileStamp = () => "s").get
    val zf = new ZipFile(path)
    try {
      val datos = readEntry(zf, "xl/worksheets/sheet1.xml")
      assert(datos.contains("""<row r="11">""") && !datos.contains("""<row r="12">"""))
      val resumen = readEntry(zf, "xl/worksheets/sheet2.xml")
      assert(resumen.contains("""<v>50</v>"""))
    } finally zf.close()
  }
}
