package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Excel (XLSX) scan (SURVEY S2; reference `run-matching.py:31`,
  * `column_processing.py:1231-1232` — small lookup workbooks read with
  * `pandas.read_excel(dtype=str)`).
  *
  * Pure-JDK implementation: XLSX is a zip of XML, so `ZipInputStream` +
  * the built-in JAXP parser cover it with zero dependencies. Matching
  * the reference's usage, every cell surfaces as a STRING (`dtype=str`
  * parity — cell text is passed through verbatim, never re-typed), the
  * first row is the header, and missing cells are null.
  *
  * The parse is driver-side by design: the reference's Excel inputs are
  * small configuration tables (large tabular data arrives as CSV or
  * parquet, S1/S3). The bytes come through the same Hadoop `FileSystem`
  * connector as S5, so a workbook in an object store reads with the
  * same call.
  */
object Excel {

  /** Read sheet `sheet` (0-based) of an XLSX workbook into a string-typed
    * DataFrame; header = first row, missing trailing cells = null.
    */
  def readXlsx(spark: SparkSession, uri: String, sheet: Int = 0): DataFrame = {
    val rows = parseRows(ObjectStore.get(spark, uri), sheet)
    require(rows.nonEmpty, s"empty sheet $sheet in $uri")
    val header = rows.head.map(v => if (v == null) "" else v)
    val width = header.length
    val data = rows.tail.map { r =>
      Row.fromSeq((0 until width).map(i => if (i < r.length) r(i) else null))
    }
    val schema = StructType(header.map(h => StructField(h, StringType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)
  }

  /** S6 `to_excel` twin: write a (small) DataFrame as a single-sheet
    * XLSX workbook — inline strings only, header row first, null cells
    * skipped, every value rendered via `String.valueOf` (the reference
    * writes str-typed frames). Driver-side collect by design, mirroring
    * the reader's small-lookup-table contract.
    */
  def writeXlsx(df: DataFrame, spark: SparkSession, uri: String): Unit = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def rowXml(r: Int, cells: Seq[Any]): String =
      cells.zipWithIndex.collect {
        case (v, i) if v != null =>
          s"""<c r="${colRef(i)}${r + 1}" t="inlineStr"><is><t>${esc(String.valueOf(v))}</t></is></c>"""
      }.mkString(s"""<row r="${r + 1}">""", "", "</row>")
    val header = rowXml(0, df.columns.toSeq)
    val body = df.collect().zipWithIndex
      .map { case (row, i) => rowXml(i + 1, row.toSeq) }.mkString
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet><sheetData>$header$body</sheetData></worksheet>""")
    z.close()
    ObjectStore.put(spark, uri, bos.toByteArray)
  }

  /** 0 → "A", 26 → "AA" — inverse of [[colIndex]]. */
  private[graft] def colRef(idx: Int): String = {
    var i = idx + 1
    val sb = new StringBuilder
    while (i > 0) { val r = (i - 1) % 26; sb.insert(0, ('A' + r).toChar); i = (i - 1) / 26 }
    sb.toString
  }

  /** Workbook bytes → rows of cell strings for one sheet (cells beyond
    * the last populated column of a row are absent).
    */
  private[graft] def parseRows(bytes: Array[Byte], sheet: Int): Seq[Array[String]] = {
    var shared: IndexedSeq[String] = IndexedSeq.empty
    var sheetXml: Array[Byte] = null
    val target = s"xl/worksheets/sheet${sheet + 1}.xml"
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "xl/sharedStrings.xml") shared = parseSharedStrings(zin.readAllBytes())
        else if (e.getName == target) sheetXml = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheetXml != null, s"workbook has no $target")
    parseSheet(sheetXml, shared)
  }

  private def dom(bytes: Array[Byte]) = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  /** `<si>` entries; rich-text runs concatenate their `<t>` descendants. */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val sis = dom(bytes).getElementsByTagName("si")
    (0 until sis.getLength).map { i =>
      val ts = sis.item(i).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("t")
      (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
    }
  }

  /** "BC7" → column index 54 (letters only; the row digits are skipped). */
  private[graft] def colIndex(cellRef: String): Int = {
    var i = 0; var acc = 0
    while (i < cellRef.length && Character.isLetter(cellRef.charAt(i))) {
      acc = acc * 26 + (cellRef.charAt(i) - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String]): Seq[Array[String]] = {
    val rows = dom(bytes).getElementsByTagName("row")
    (0 until rows.getLength).map { r =>
      val cells = rows.item(r).asInstanceOf[org.w3c.dom.Element].getElementsByTagName("c")
      val parsed = (0 until cells.getLength).map { c =>
        val cell = cells.item(c).asInstanceOf[org.w3c.dom.Element]
        val ref = cell.getAttribute("r")
        val idx = if (ref.nonEmpty) colIndex(ref) else c
        val t = cell.getAttribute("t")
        val value = t match {
          case "s" =>
            val vs = cell.getElementsByTagName("v")
            if (vs.getLength == 0) null else shared(vs.item(0).getTextContent.trim.toInt)
          case "inlineStr" =>
            val ts = cell.getElementsByTagName("t")
            (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
          case _ => // n, str, b, d or untyped: the raw <v> text, verbatim
            val vs = cell.getElementsByTagName("v")
            if (vs.getLength == 0) null else vs.item(0).getTextContent
        }
        idx -> value
      }
      val width = if (parsed.isEmpty) 0 else parsed.map(_._1).max + 1
      val arr = new Array[String](width)
      parsed.foreach { case (i, v) => if (i >= 0 && i < width) arr(i) = v }
      arr
    }
  }
}
