package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Builds a minimal real ECMA-376 workbook (zip + XML) in the test and
  * reads it back through the S2 scan. */
class ExcelReaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeXlsx(useShared: Boolean): String = {
    val dir = Files.createTempDirectory("graft-xlsx")
    val path = dir.resolve("book.xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>""")
    if (useShared) {
      put("xl/sharedStrings.xml",
        """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4"><si><t>businessName</t></si><si><t>country1</t></si><si><t>Acme Foods</t></si><si><t>USA</t></si></sst>""")
      put("xl/worksheets/sheet1.xml",
        """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1"><v>42</v></c></row>
          |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>7.5</v></c></row>
          |<row r="3"><c r="A3" t="s"><v>2</v></c><c r="C3"><v>9</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    } else {
      put("xl/worksheets/sheet1.xml",
        """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c><c r="B1" t="inlineStr"><is><t>qty</t></is></c></row>
          |<row r="2"><c r="A2" t="inlineStr"><is><t>Widget</t></is></c><c r="B2"><v>3</v></c></row>
          |</sheetData></worksheet>""".stripMargin)
    }
    zos.close()
    path
  }

  test("S2: shared-strings workbook reads with header row and gaps as null") {
    val df = ExcelReader.readXlsx(spark, writeXlsx(useShared = true))
    assert(df.columns.toSeq == Seq("businessName", "country1", "42"))
    val rows = df.orderBy("42").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "Acme Foods" && rows(0).getString(1) == "USA")
    assert(rows(1).getString(1) == null) // B3 missing -> null
  }

  test("S2: inline-string workbook reads numbers as text") {
    val df = ExcelReader.readXlsx(spark, writeXlsx(useShared = false))
    assert(df.columns.toSeq == Seq("name", "qty"))
    assert(df.collect()(0).getString(1) == "3")
  }

  test("S2 feeds the header-mapping pipeline (J8 on xlsx input)") {
    val df = ExcelReader.readXlsx(spark, writeXlsx(useShared = true))
    val m = graft.operators.HeaderMapper.mapHeaders(df.columns.toSeq)
    assert(m.mapping.get("businessName").contains("businessName"))
    assert(m.mapping.get("country1").contains("country1"))
  }

  test("S2: date-styled numeric cells render as typed dates (openpyxl parity)") {
    val dir = Files.createTempDirectory("graft-xlsx-dates")
    val path = dir.resolve("dated.xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>""")
    // style 0: General; style 1: builtin date 14 (mm-dd-yy); style 2:
    // custom 164 "yyyy\-mm\-dd"; style 3: custom 165 quoted literal
    // containing 'd' chars but NO date tokens -> NOT a date format
    put("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<numFmts count="2"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd hh:mm"/><numFmt numFmtId="165" formatCode="&quot;dddd&quot;0.0"/></numFmts>
        |<cellXfs count="4"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/><xf numFmtId="164" applyNumberFormat="1"/><xf numFmtId="165" applyNumberFormat="1"/></cellXfs>
        |</styleSheet>""".stripMargin)
    // serial computed FROM the expected date, not hardcoded
    val serial = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1899, 12, 30), java.time.LocalDate.of(2024, 1, 15))
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |<row r="1"><c r="A1" t="inlineStr"><is><t>joined</t></is></c><c r="B1" t="inlineStr"><is><t>seen</t></is></c><c r="C1" t="inlineStr"><is><t>score</t></is></c><c r="D1" t="inlineStr"><is><t>plain</t></is></c></row>
         |<row r="2"><c r="A2" s="1"><v>$serial</v></c><c r="B2" s="2"><v>${serial + 0.5}</v></c><c r="C2" s="3"><v>42.5</v></c><c r="D2"><v>7</v></c></row>
         |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val row = ExcelReader.readXlsx(spark, path).collect()(0)
    // builtin date style -> openpyxl's str(datetime) rendering
    assert(row.getString(0) == "2024-01-15 00:00:00")
    // custom date format with a time fraction (0.5 = noon)
    assert(row.getString(1) == "2024-01-15 12:00:00")
    // quoted 'dddd' is a literal, not a date token: raw number survives
    assert(row.getString(2) == "42.5")
    // unstyled numerics stay numeric text
    assert(row.getString(3) == "7")
  }

  test("excelSerialToString handles the 1900 leap-year phantom day") {
    // serial 59 = 1900-02-28, serial 61 = 1900-03-01; the phantom
    // serial 60 (Excel's fake 1900-02-29) collapses onto 02-28, the
    // same mapping openpyxl's from_excel produces
    assert(ExcelReader.excelSerialToString(59) == "1900-02-28 00:00:00")
    assert(ExcelReader.excelSerialToString(60) == "1900-02-28 00:00:00")
    assert(ExcelReader.excelSerialToString(61) == "1900-03-01 00:00:00")
    // openpyxl 3.1 (the reference pin) checks the time case FIRST:
    // 0 <= serial < 1 is a datetime.time — no bogus date prefix
    assert(ExcelReader.excelSerialToString(0) == "00:00:00")
    assert(ExcelReader.excelSerialToString(0.25) == "06:00:00")
    assert(ExcelReader.excelSerialToString(0.999988425925926) == "23:59:59")
    // serial just under 1 rounds to 86400 s — the clamp must hold it
    // at 23:59:59 instead of wrapping a full day back to midnight
    assert(ExcelReader.excelSerialToString(0.9999999) == "23:59:59")
    // negatives skip both the time case and the bump
    assert(ExcelReader.excelSerialToString(-1) == "1899-12-29 00:00:00")
    assert(ExcelReader.excelSerialToString(1) == "1900-01-01 00:00:00")
    assert(ExcelReader.excelSerialToString(1.5) == "1900-01-01 12:00:00")
    assert(ExcelReader.isDateFormatCode("yyyy-mm-dd"))
    assert(ExcelReader.isDateFormatCode("[$-409]h:mm AM/PM"))
    assert(!ExcelReader.isDateFormatCode("#,##0.00"))
    assert(!ExcelReader.isDateFormatCode("\"days\"0"))
  }

  test("colIndex decodes A1-style refs") {
    assert(ExcelReader.colIndex("A1") == 0)
    assert(ExcelReader.colIndex("Z9") == 25)
    assert(ExcelReader.colIndex("AA3") == 26)
  }

  test("1904 date system: workbookPr date1904 shifts the epoch, no leap bump") {
    // serial algebra first: Mac 1904 epoch; the time-only case fires
    // before the epoch matters (openpyxl's from_excel order), and the
    // phantom-1900-02-29 bump must NOT apply
    assert(ExcelReader.excelSerialToString(0, date1904 = true)
      == "00:00:00")
    assert(ExcelReader.excelSerialToString(1, date1904 = true)
      == "1904-01-02 00:00:00")
    assert(ExcelReader.excelSerialToString(59, date1904 = true)
      == "1904-02-29 00:00:00") // 1904 really was a leap year
    val dir = Files.createTempDirectory("graft-xlsx-1904")
    val path = dir.resolve("mac.xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><workbookPr date1904="1"/><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>""")
    put("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/></cellXfs>
        |</styleSheet>""".stripMargin)
    val serial = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1904, 1, 1), java.time.LocalDate.of(2024, 6, 1))
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
         |<row r="1"><c r="A1" t="inlineStr"><is><t>joined</t></is></c></row>
         |<row r="2"><c r="A2" s="1"><v>$serial</v></c></row>
         |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val row = ExcelReader.readXlsx(spark, path).collect()(0)
    // without the epoch flag this would render 2020-05-31 (~4y early)
    assert(row.getString(0) == "2024-06-01 00:00:00")
  }

  test("sheet parts resolve through workbook rels, not positional names") {
    // a workbook whose first sheet was deleted in Excel: the only
    // remaining part is sheet2.xml and the rels map sheet order to it —
    // the naive sheet1.xml guess would reject this valid file
    val dir = Files.createTempDirectory("graft-xlsx-rels")
    val path = dir.resolve("gap.xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Kept" sheetId="2" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/></Relationships>""")
    put("xl/worksheets/sheet2.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>Widget</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val df = ExcelReader.readXlsx(spark, path)
    assert(df.columns.toSeq == Seq("name"))
    assert(df.collect()(0).getString(0) == "Widget")
  }


  test("S2: phonetic runs excluded; bool/err cells match the BIFF contract") {
    val dir = Files.createTempDirectory("graft-xlsx-rph")
    val path = dir.resolve("rph.xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>""")
    // one rich-text shared string with a furigana <rPh> run openpyxl
    // would exclude from the value
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="1" uniqueCount="1"><si><r><t>東京</t></r><rPh sb="0" eb="2"><t>トウキョウ</t></rPh><phoneticPr fontId="1"/></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>name</t></is></c><c r="B1" t="inlineStr"><is><t>flag</t></is></c><c r="C1" t="inlineStr"><is><t>err</t></is></c><c r="D1" t="inlineStr"><is><t>f2</t></is></c></row>
        |<row r="2"><c r="A2" t="s"><v>0</v></c><c r="B2" t="b"><v>1</v></c><c r="C2" t="e"><v>#DIV/0!</v></c><c r="D2" t="b"><v>0</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val row = ExcelReader.readXlsx(spark, path).collect().head
    assert(row.getString(0) == "東京")   // NOT 東京トウキョウ
    assert(row.getString(1) == "TRUE")  // the BiffReader rendering
    assert(row.getString(2) == null)    // error cells read as blank
    assert(row.getString(3) == "FALSE")
    // an out-of-range sheet index rejects loudly — never the positional
    // part-name guess that could read an orphaned worksheet
    val e = intercept[Exception](ExcelReader.readXlsx(spark, path, sheet = 3))
    assert(e.getMessage.contains("out of range"), e.getMessage)
  }

  test("S2: omitted blank rows are densified; lowercase refs map correctly") {
    // Excel drops blank rows from the sheet XML entirely: row 1 (the
    // header) is absent here, and row 3 is an interior gap — the grid
    // must pad both (openpyxl parity), NOT promote row 2 to header.
    // The 'b4' ref is lowercase (third-party writers): it must land in
    // column B, not column 32.
    val dir = Files.createTempDirectory("graft-xlsx-sparse")
    val path = dir.resolve("sparse.xlsx").toString
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>v1</t></is></c><c r="B2" t="inlineStr"><is><t>w1</t></is></c></row>
        |<row r="4"><c r="A4" t="inlineStr"><is><t>v3</t></is></c><c r="b4" t="inlineStr"><is><t>w3</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val df = ExcelReader.readXlsx(spark, path)
    // blank row 1 -> fallback header names, and BOTH data rows survive
    assert(df.columns.toSeq == Seq("col0", "col1"), df.columns.toSeq)
    val rows = df.collect()
    assert(rows.length == 3) // rows 2, 3 (blank), 4
    assert(rows(0).getString(0) == "v1" && rows(0).getString(1) == "w1")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1)) // interior gap
    assert(rows(2).getString(0) == "v3" && rows(2).getString(1) == "w3")
  }

  test("S2: an out-of-bounds row reference is a typed rejection, not a " +
    "driver-side densification OOM") {
    // densification materializes (0 to maxRow) rows driver-side: a
    // crafted/corrupt r="2000000000" must be rejected at the xlsx 2^20
    // row bound BEFORE that allocation, with the reader's typed
    // malformed-reference error (same contract as a letterless ref)
    val dir = Files.createTempDirectory("graft-xlsx-hugerow")
    def workbook(name: String, rowAttr: String): String = {
      val path = dir.resolve(name).toString
      val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
      def put(n: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(n)); zos.write(content.getBytes("UTF-8")); zos.closeEntry()
      }
      put("[Content_Types].xml",
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
      put("xl/workbook.xml",
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>""")
      put("xl/worksheets/sheet1.xml",
        s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
          |<row r="1"><c r="A1" t="inlineStr"><is><t>h</t></is></c></row>
          |<row r="$rowAttr"><c t="inlineStr"><is><t>x</t></is></c></row>
          |</sheetData></worksheet>""".stripMargin)
      zos.close()
      path
    }
    val huge = intercept[IllegalArgumentException] {
      ExcelReader.readXlsx(spark, workbook("huge.xlsx", "2000000000"))
    }
    assert(huge.getMessage.contains("malformed row reference"))
    // non-numeric r: same typed rejection, never a raw parser escape
    val bad = intercept[Exception] {
      ExcelReader.readXlsx(spark, workbook("bad.xlsx", "12abc"))
    }
    assert(bad.isInstanceOf[IllegalArgumentException] ||
      bad.isInstanceOf[graft.sources.Ingest.UnsupportedFormat])
    // and an ordinary in-bounds r still reads (the guard must not
    // reject legal sparse rows)
    val ok = ExcelReader.readXlsx(spark, workbook("ok.xlsx", "3"))
    assert(ok.collect().length == 2) // rows 2..3: gap + data
    // xsd:unsignedInt's lexical space permits leading zeros: a
    // zero-padded in-bounds r (value 3, 8 lexical digits) must read
    // identically to r="3", not trip the overflow-safety length cap
    val padded = ExcelReader.readXlsx(spark, workbook("padded.xlsx", "00000003"))
    assert(padded.collect().length == 2)
    // ...while a zero-padded OUT-of-bounds value is still rejected on
    // its VALUE (the bound survives the normalization)
    val paddedHuge = intercept[IllegalArgumentException] {
      ExcelReader.readXlsx(spark, workbook("phuge.xlsx", "0002000000000"))
    }
    assert(paddedHuge.getMessage.contains("malformed row reference"))
    // r="0" (and its all-zeros lexical forms) stays rejected: rows are
    // 1-based
    val zero = intercept[IllegalArgumentException] {
      ExcelReader.readXlsx(spark, workbook("zero.xlsx", "000"))
    }
    assert(zero.getMessage.contains("malformed row reference"))
  }
}
