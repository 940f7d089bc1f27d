package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.sources.Excel

/** S2 XLSX scan: a workbook zip is crafted in-test (pure JDK, the same
  * container a spreadsheet app writes) and read back — header naming,
  * shared vs inline strings, rich-text runs, raw numeric passthrough
  * (`dtype=str` parity), skipped-cell null padding, and the A1-style
  * column addressing are all value-checked.
  */
class ExcelSpec extends SparkSpec {

  private def entry(z: ZipOutputStream, name: String, content: String): Unit = {
    z.putNextEntry(new ZipEntry(name))
    z.write(content.getBytes("UTF-8"))
    z.closeEntry()
  }

  /** A minimal two-sheet workbook: shared strings (one rich-text), and a
    * sheet mixing shared strings, inline strings, numbers, and gaps.
    */
  private def workbook(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entry(z, "[Content_Types].xml", """<?xml version="1.0"?><Types/>""")
    entry(z, "xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst count="4" uniqueCount="4">
        |<si><t>name</t></si>
        |<si><t>camp</t></si>
        |<si><r><t>Ausch</t></r><r><t>witz</t></r></si>
        |<si><t>Dachau</t></si>
        |</sst>""".stripMargin)
    entry(z, "xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>code</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>1017.50</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>inline name</t></is></c><c r="C3"><v>7</v></c></row>
        |<row r="4"><c r="A4" t="s"><v>3</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    entry(z, "xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?>
        |<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>only</t></is></c></row>
        |<row r="2"><c r="A2"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    z.close()
    bos.toByteArray
  }

  test("XLSX scan: header, shared/inline/rich strings, numbers as text, null gaps") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx")
    val f = dir.resolve("lookup.xlsx").toFile
    val out = new FileOutputStream(f)
    try out.write(workbook()) finally out.close()

    val df = Excel.readXlsx(spark, "file://" + f.getAbsolutePath)
    assert(df.columns.toSeq === Seq("name", "camp", "code"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length === 3)
    // rich-text shared string concatenates runs; numbers pass through verbatim
    assert(rows(0) === (("Auschwitz", "Dachau", "1017.50")))
    // row 3 skips column B entirely -> null, A1-addressing keeps C in place
    assert(rows(1) === (("inline name", null, "7")))
    // short row -> trailing nulls
    assert(rows(2) === (("Dachau", null, null)))

    // second sheet by index
    val s2 = Excel.readXlsx(spark, "file://" + f.getAbsolutePath, sheet = 1)
    assert(s2.columns.toSeq === Seq("only"))
    assert(s2.collect().map(_.getString(0)).toSeq === Seq("42"))

    // the frame is a normal distributed DataFrame: joinable/filterable
    assert(df.filter(org.apache.spark.sql.functions.col("camp").isNull).count() === 2)
  }

  test("data wider than the header surfaces as Unnamed columns; corrupt shared indices fail with named errors") {
    def wb(sheetXml: String, shared: String = "<sst/>"): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val z = new ZipOutputStream(bos)
      entry(z, "[Content_Types].xml", """<?xml version="1.0"?><Types/>""")
      entry(z, "xl/sharedStrings.xml", s"""<?xml version="1.0"?>$shared""")
      entry(z, "xl/worksheets/sheet1.xml", s"""<?xml version="1.0"?>$sheetXml""")
      z.close(); bos.toByteArray
    }
    def write(bytes: Array[Byte]): String = {
      val f = java.nio.file.Files.createTempDirectory("graft-xlsx-w").resolve("w.xlsx").toFile
      val out = new FileOutputStream(f)
      try out.write(bytes) finally out.close()
      "file://" + f.getAbsolutePath
    }
    // pandas reads the sheet's full rectangle: a 1-cell header over
    // 3-cell data rows must yield Unnamed: 1/2 columns, not silent loss
    val wide = write(wb(
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>
        |<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c><c r="C2"><v>3</v></c></row>
        |</sheetData></worksheet>""".stripMargin))
    val df = Excel.readXlsx(spark, wide)
    assert(df.columns.toSeq === Seq("h", "Unnamed: 1", "Unnamed: 2"))
    assert(df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
      === Seq(("1", "2", "3")))
    // crafted shared-string references fail with the module's named
    // hardening errors, not a raw NumberFormat/IndexOutOfBounds
    val outOfRange = write(wb(
      """<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>99999</v></c></row></sheetData></worksheet>""",
      """<sst><si><t>x</t></si></sst>"""))
    val e1 = intercept[IllegalArgumentException](Excel.readXlsx(spark, outOfRange))
    assert(e1.getMessage.contains("out of range"))
    val notInt = write(wb(
      """<worksheet><sheetData><row r="1"><c r="A1" t="s"><v>xyz</v></c></row></sheetData></worksheet>""",
      """<sst><si><t>x</t></si></sst>"""))
    val e2 = intercept[IllegalArgumentException](Excel.readXlsx(spark, notInt))
    assert(e2.getMessage.contains("not an integer"))
  }

  test("column-reference arithmetic handles multi-letter columns") {
    assert(Excel.colIndex("A1") === 0)
    assert(Excel.colIndex("Z9") === 25)
    assert(Excel.colIndex("AA12") === 26)
    assert(Excel.colIndex("BC7") === 54)
    for (i <- 0 until 100) assert(Excel.colIndex(Excel.colRef(i) + "1") === i)
  }

  test("parseRows terminates on mutated workbooks: bounded failures, never a hang or an Error") {
    // Excel is a DRIVER-side source whose contract is throw-on-malformed
    // (named-limit guards), unlike the per-row media codecs' None
    // contract — so the fuzz property here is termination and failure
    // class: every mutation either parses or throws an Exception;
    // StackOverflowError / OutOfMemoryError (parser bombs) never escape.
    val rnd = new scala.util.Random(777L)
    val base = workbook()
    def attempt(bytes: Array[Byte]): Unit =
      try { Excel.parseRows(bytes, 0); () }
      catch {
        case _: Exception => () // the documented driver-boundary contract
        case e: Error => fail(s"parser bomb escaped as ${e.getClass.getName}")
      }
    for (_ <- 1 to 600) {
      val b = base.clone()
      for (_ <- 0 to rnd.nextInt(6)) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      attempt(b)
    }
    for (cut <- 0 until base.length by 3) attempt(base.take(cut))
  }

  test("XLSX sink round-trips through the reader (S6 to_excel twin)") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-w")
    val uri = "file://" + dir.resolve("out.xlsx").toString
    val df = Seq(("a", "1 < 2 & 3", null: String), ("b", null: String, "z"))
      .toDF("k", "weird", "maybe")
    Excel.writeXlsx(df, spark, uri)
    val back = Excel.readXlsx(spark, uri)
    assert(back.columns.toSeq === Seq("k", "weird", "maybe"))
    val rows = back.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(("a", "1 < 2 & 3", null), ("b", null, "z")))
  }

  test("driver-boundary hardening: row cap, XML-illegal chars, column-ref bomb") {
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-g")
    val uri = "file://" + dir.resolve("g.xlsx").toString
    // a misrouted big table fails loudly at the declared cap, not by OOM
    val big = Seq("r1", "r2", "r3").toDF("v")
    val capErr = intercept[IllegalArgumentException](
      Excel.writeXlsx(big, spark, uri, maxRows = 2))
    assert(capErr.getMessage.contains("small-workbook sink"))
    // the header row counts against the sheet limit: maxRows=2 leaves
    // room for exactly 1 data row — 2 data rows would emit 3 sheet rows
    val twoRows = Seq("r1", "r2").toDF("v")
    val hdrErr = intercept[IllegalArgumentException](
      Excel.writeXlsx(twoRows, spark, uri, maxRows = 2))
    assert(hdrErr.getMessage.contains("small-workbook sink"))
    Excel.writeXlsx(Seq("r1").toDF("v"), spark, uri, maxRows = 2)
    // XML 1.0 cannot represent U+0001 at all; the sink must reject it
    // rather than emit a workbook its own reader refuses to parse
    val dirty = Seq("ok", "bad\u0001cell").toDF("v")
    val escErr = intercept[IllegalArgumentException](
      Excel.writeXlsx(dirty, spark, uri))
    assert(escErr.getMessage.contains("U+0001"))
    // tab/CR/LF are legal XML and must round-trip, not be rejected
    Excel.writeXlsx(Seq("a\tb\nc").toDF("v"), spark, uri)
    assert(Excel.readXlsx(spark, uri).collect().map(_.getString(0)).toSeq
      === Seq("a\tb\nc"))
    // crafted cell ref: bounded at the XLSX column limit, no huge array
    assert(Excel.colIndex("XFD1") === Excel.MaxColumns - 1)
    val refErr = intercept[IllegalArgumentException](Excel.colIndex("ZZZZ1"))
    assert(refErr.getMessage.contains("column limit"))
  }
}
