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
  *
  * Hardening for partner-supplied workbooks: sheet index resolves
  * through `xl/workbook.xml` tab order + the package relationships (not
  * the physical `sheetN.xml` part name, which drifts when sheets are
  * deleted/reordered in Excel), XML parsing rejects DOCTYPE declarations
  * (XXE / entity-expansion), and blank or duplicate header cells get
  * pandas-style disambiguation (`Unnamed: N`, `name.1`).
  */
object Excel {

  /** XLSX spec bounds (Excel itself stores at most XFD = 16384 columns /
    * 1048576 rows). A cell ref past the column bound is a crafted or
    * corrupt workbook — without the check a single `<c r="ZZZZ1">` forces
    * a ~475k-slot row array and a longer run overflows Int.
    */
  val MaxColumns = 16384
  val MaxRows = 1 << 20

  /** Decompressed-size cap per XML part. The contract for this source is
    * small lookup workbooks; a part blowing past this is either a
    * misrouted big table or a zip bomb, and either should fail with a
    * named limit instead of a driver OOM.
    */
  val MaxPartBytes: Int = 64 << 20

  /** Read sheet `sheet` (0-based workbook tab order) of an XLSX workbook
    * into a string-typed DataFrame; header = first row, missing trailing
    * cells = null.
    */
  def readXlsx(spark: SparkSession, uri: String, sheet: Int = 0): DataFrame = {
    val rows = parseRows(ObjectStore.get(spark, uri), sheet)
    require(rows.nonEmpty, s"empty sheet $sheet in $uri")
    // pandas.read_excel parity: blank headers become "Unnamed: N", a
    // repeated name gets ".k" suffixes — two blanks would otherwise
    // yield duplicate empty StructField names (unusable by name)
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val header = rows.head.zipWithIndex.map { case (v, i) =>
      val base = if (v == null || v.isEmpty) s"Unnamed: $i" else v
      val n = seen.getOrElse(base, 0)
      seen(base) = n + 1
      if (n == 0) base else s"$base.$n"
    }
    // pandas parity continued: pandas reads the sheet's full rectangle,
    // so data cells BEYOND the header's width surface as extra
    // "Unnamed: N" columns — silently truncating them would drop data
    val width = math.max(header.length, rows.tail.foldLeft(0)((m, r) => math.max(m, r.length)))
    val fullHeader = header ++ (header.length until width).map(i => s"Unnamed: $i")
    val data = rows.tail.map { r =>
      Row.fromSeq((0 until width).map(i => if (i < r.length) r(i) else null))
    }
    val schema = StructType(fullHeader.map(h => StructField(h, StringType)).toSeq)
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)
  }

  /** S6 `to_excel` twin: write a (small) DataFrame as a single-sheet
    * XLSX workbook — inline strings only, header row first, null cells
    * skipped, every value rendered via `String.valueOf` (the reference
    * writes str-typed frames). Driver-side collect by design, mirroring
    * the reader's small-lookup-table contract. Emits a complete OPC
    * package (content types, package + workbook relationships, workbook
    * part) so Excel/pandas/openpyxl can open the file, not just this
    * repo's reader.
    */
  def writeXlsx(df: DataFrame, spark: SparkSession, uri: String,
      maxRows: Int = MaxRows): Unit = {
    def esc(s: String): String = {
      // XML 1.0 cannot represent control chars below 0x20 (except
      // tab/LF/CR) AT ALL — not even as entities; emitting them verbatim
      // produces a workbook this module's own DOCTYPE-hardened reader
      // (and Excel) rejects. Fail with the offending char, openpyxl-style.
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c < 0x20 && c != '\t' && c != '\n' && c != '\r')
          throw new IllegalArgumentException(
            f"cell value contains XML-illegal control character U+$c%04X " +
              s"(index $i); clean the column before writeXlsx")
        i += 1
      }
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    }
    def rowXml(r: Int, cells: Seq[Any]): String =
      cells.zipWithIndex.collect {
        case (v, i) if v != null =>
          s"""<c r="${colRef(i)}${r + 1}" t="inlineStr"><is><t xml:space="preserve">${esc(String.valueOf(v))}</t></is></c>"""
      }.mkString(s"""<row r="${r + 1}">""", "", "</row>")
    val header = rowXml(0, df.columns.toSeq)
    // driver-boundary guard: this sink materializes the frame on the
    // driver by design (small lookup workbooks); a misrouted big table
    // must fail loudly here, not as a driver OOM. limit(cap+1) keeps the
    // guard a single pass — no extra count() job. The header occupies
    // sheet row 1, so the DATA budget is maxRows - 1: a frame of exactly
    // maxRows data rows would emit maxRows + 1 sheet rows, one past the
    // XLSX limit the error message cites.
    val dataCap = maxRows - 1
    val collected = df.limit(dataCap + 1).collect()
    require(collected.length <= dataCap,
      s"writeXlsx is a small-workbook sink: input exceeds $dataCap data rows " +
        s"(XLSX sheet limit is $MaxRows rows including the header); " +
        "route big tables to CSV/parquet")
    val body = collected.zipWithIndex
      .map { case (row, i) => rowXml(i + 1, row.toSeq) }.mkString
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, content: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
        """</Types>""")
    entry("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
        """</Relationships>""")
    entry("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$header$body</sheetData></worksheet>""")
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

  private val RelNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

  /** Workbook bytes → rows of cell strings for one sheet (cells beyond
    * the last populated column of a row are absent). `sheet` indexes the
    * workbook's declared tab order.
    */
  private[graft] def parseRows(bytes: Array[Byte], sheet: Int): Seq[Array[String]] = {
    // collect the XML parts (media/binary parts skipped) — workbooks
    // here are small lookup tables by contract, driver-side is fine
    val parts = scala.collection.mutable.Map.empty[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName.endsWith(".xml") || e.getName.endsWith(".rels")) {
          // bounded read: zip headers lie about sizes, so cap what is
          // actually inflated — a part past the cap is a zip bomb or a
          // misrouted big table, not a lookup workbook
          val data = zin.readNBytes(MaxPartBytes + 1)
          require(data.length <= MaxPartBytes,
            s"workbook part ${e.getName} exceeds $MaxPartBytes decompressed bytes")
          parts(e.getName) = data
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    val target = sheetPart(parts, sheet)
    val sheetXml = parts.getOrElse(target,
      throw new IllegalArgumentException(s"workbook has no $target"))
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    parseSheet(sheetXml, shared)
  }

  /** Resolve a 0-based sheet index to its worksheet part name through
    * `xl/workbook.xml` (tab order) + `xl/_rels/workbook.xml.rels`
    * (r:id → part). Physical `sheetN.xml` numbering is NOT tab order:
    * deleting Sheet1 in Excel leaves parts named sheet2/sheet3 with the
    * tab order only in workbook.xml. Falls back to physical naming when
    * the workbook/rels parts are absent (minimal hand-built packages).
    */
  private def sheetPart(parts: collection.Map[String, Array[Byte]], sheet: Int): String = {
    val fallback = s"xl/worksheets/sheet${sheet + 1}.xml"
    parts.get("xl/workbook.xml").flatMap { wb =>
      val sheets = dom(wb).getElementsByTagNameNS("*", "sheet")
      if (sheets.getLength == 0) None
      else {
        require(sheet < sheets.getLength,
          s"workbook declares ${sheets.getLength} sheet(s); no index $sheet")
        val el = sheets.item(sheet).asInstanceOf[org.w3c.dom.Element]
        val rid = {
          val ns = el.getAttributeNS(RelNs, "id")
          if (ns.nonEmpty) ns else el.getAttribute("r:id")
        }
        parts.get("xl/_rels/workbook.xml.rels").flatMap { rb =>
          val rels = dom(rb).getElementsByTagNameNS("*", "Relationship")
          (0 until rels.getLength).map { i =>
            val r = rels.item(i).asInstanceOf[org.w3c.dom.Element]
            r.getAttribute("Id") -> r.getAttribute("Target")
          }.toMap.get(rid).map { t =>
            // rels targets are workbook-part-relative; "/x" is package-root
            if (t.startsWith("/")) t.drop(1) else "xl/" + t
          }
        }
      }
    }.getOrElse(fallback)
  }

  /** Namespace-aware, entity-hardened parse: DOCTYPE is rejected
    * outright — partner-supplied workbooks are untrusted input, and a
    * crafted DTD means file exfiltration (XXE) or entity-expansion OOM.
    */
  private def dom(bytes: Array[Byte]) = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  /** `<si>` entries; rich-text runs concatenate their `<t>` descendants. */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val sis = dom(bytes).getElementsByTagNameNS("*", "si")
    (0 until sis.getLength).map { i =>
      val ts = sis.item(i).asInstanceOf[org.w3c.dom.Element].getElementsByTagNameNS("*", "t")
      (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
    }
  }

  /** "BC7" → column index 54 (letters only; the row digits are skipped).
    * Bounded by [[MaxColumns]]: checked inside the accumulation so a long
    * crafted letter run fails fast instead of overflowing Int.
    */
  private[graft] def colIndex(cellRef: String): Int = {
    var i = 0; var acc = 0
    while (i < cellRef.length && Character.isLetter(cellRef.charAt(i))) {
      acc = acc * 26 + (cellRef.charAt(i) - 'A' + 1)
      require(acc <= MaxColumns,
        s"cell ref '$cellRef' is past the XLSX column limit ($MaxColumns)")
      i += 1
    }
    acc - 1
  }

  private def parseSheet(bytes: Array[Byte], shared: IndexedSeq[String]): Seq[Array[String]] = {
    val rows = dom(bytes).getElementsByTagNameNS("*", "row")
    (0 until rows.getLength).map { r =>
      val cells = rows.item(r).asInstanceOf[org.w3c.dom.Element].getElementsByTagNameNS("*", "c")
      val parsed = (0 until cells.getLength).map { c =>
        val cell = cells.item(c).asInstanceOf[org.w3c.dom.Element]
        val ref = cell.getAttribute("r")
        val idx = if (ref.nonEmpty) colIndex(ref) else c
        val t = cell.getAttribute("t")
        val value = t match {
          case "s" =>
            val vs = cell.getElementsByTagNameNS("*", "v")
            if (vs.getLength == 0) null
            else {
              // hardened like every other malformed-input case in this
              // file: a crafted shared-string index must fail with the
              // named limit, not a raw NumberFormat/IndexOutOfBounds
              // from deep inside the parse
              val raw = vs.item(0).getTextContent.trim
              val si = raw.toIntOption.getOrElse(
                throw new IllegalArgumentException(
                  s"XLSX shared-string index is not an integer: '$raw'"))
              require(si >= 0 && si < shared.length,
                s"XLSX shared-string index $si out of range [0, ${shared.length})")
              shared(si)
            }
          case "inlineStr" =>
            val ts = cell.getElementsByTagNameNS("*", "t")
            (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
          case _ => // n, str, b, d or untyped: the raw <v> text, verbatim
            val vs = cell.getElementsByTagNameNS("*", "v")
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
