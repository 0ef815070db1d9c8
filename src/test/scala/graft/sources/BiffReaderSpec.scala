package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** Builds a real BIFF8 workbook inside a real OLE2/CFB container from
  * scratch (independent byte-level writers, not the reader's own code)
  * and reads it back through the S2b scan. */
class BiffReaderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // independent BIFF8 byte writers (shared with MatchQualitySpec's
  // xlsx↔xls interchangeability round-trip)
  import BiffTestWriter._

  /** The workbook stream: globals (BOF, FORMAT 164, XFs, SST with a
    * CONTINUE-split string and a wide string, BOUNDSHEET, EOF) + one
    * worksheet substream exercising every cell record kind. */
  private def workbookStream(): Array[Byte] = {
    val serial = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1899, 12, 30), java.time.LocalDate.of(2024, 1, 15))

    // SST: 6 strings; s4 is wide UTF-16 ("x✓"), s5 is split mid-string
    // across a CONTINUE that restates the compressed flag byte
    val sstPayload = le(
      i32(6), i32(6),
      ustr("name"), ustr("when"), ustr("qty"), ustr("café"),
      le(u16(2), Array[Byte](1), "x✓".getBytes("UTF-16LE")),
      le(u16(11), Array[Byte](0), "Split".getBytes("ISO-8859-1")))
    val continuePayload = le(Array[Byte](0), "String".getBytes("ISO-8859-1"))

    def globals(sheetPos: Int): Array[Byte] = le(
      rec(0x0809, le(u16(0x0600), u16(0x0005), u16(0), u16(0), i32(0), i32(0))),
      rec(0x041E, le(u16(164), ustr("yyyy\\-mm\\-dd"))),
      rec(0x00E0, le(u16(0), u16(0), new Array[Byte](16))),   // XF0: General
      rec(0x00E0, le(u16(0), u16(14), new Array[Byte](16))),  // XF1: builtin date
      rec(0x00E0, le(u16(0), u16(164), new Array[Byte](16))), // XF2: custom date
      rec(0x00FC, sstPayload),
      rec(0x003C, continuePayload),
      rec(0x0085, le(i32(sheetPos), u16(0),
        Array[Byte](2, 0), "S1".getBytes("ISO-8859-1"))),
      rec(0x000A, Array.empty[Byte]))

    val sheet = le(
      rec(0x0809, le(u16(0x0600), u16(0x0010), u16(0), u16(0), i32(0), i32(0))),
      // header row 0: LABELSST ×3, inline LABEL, wide SST, split SST, LABEL
      rec(0x00FD, le(cellHead(0, 0, 0), i32(0))),
      rec(0x00FD, le(cellHead(0, 1, 0), i32(1))),
      rec(0x00FD, le(cellHead(0, 2, 0), i32(2))),
      rec(0x0204, le(cellHead(0, 3, 0), ustr("city"))),
      rec(0x00FD, le(cellHead(0, 4, 0), i32(4))),
      rec(0x00FD, le(cellHead(0, 5, 0), i32(5))),
      rec(0x0204, le(cellHead(0, 6, 0), ustr("flag"))),
      rec(0x0204, le(cellHead(0, 7, 0), ustr("fnum"))),
      rec(0x0204, le(cellHead(0, 8, 0), ustr("fstr"))),
      rec(0x0204, le(cellHead(0, 9, 0), ustr("fbool"))),
      rec(0x0204, le(cellHead(0, 10, 0), ustr("ferr"))),
      // data row 1: shared string, date NUMBER, RK int, RK double,
      // MULRK (int + ×1/100), BOOLERR
      rec(0x00FD, le(cellHead(1, 0, 0), i32(3))),
      rec(0x0203, le(cellHead(1, 1, 1), f64(serial.toDouble))),
      rec(0x027E, le(cellHead(1, 2, 0), i32((300 << 2) | 2))),
      rec(0x027E, le(cellHead(1, 3, 0), i32(0x40040000))), // 2.5 as fp RK
      rec(0x00BD, le(u16(1), u16(4),
        u16(0), i32((7 << 2) | 2),          // E2: int 7
        u16(0), i32((250 << 2) | 2 | 1),    // F2: 250/100 = 2.5
        u16(5))),
      rec(0x0205, le(cellHead(1, 6, 0), Array[Byte](1, 0))), // TRUE
      // FORMULA cached results: numeric inline; string via the trailing
      // STRING record (with an unrelated record between, as real writers
      // emit SHRFMLA there); boolean; error (-> blank)
      formulaRec(1, 7, 0, f64(42.5)),
      formulaRec(1, 8, 0, fval(0, 0)),
      rec(0x04BC, new Array[Byte](8)),        // SHRFMLA stand-in, skipped
      rec(0x0207, ustr("calc")),
      formulaRec(1, 9, 0, fval(1, 1)),
      formulaRec(1, 10, 0, fval(2, 0x07)),    // #DIV/0! -> blank
      rec(0x000A, Array.empty[Byte]))

    val g = globals(0)
    globals(g.length) ++ sheet
  }

  private def writeXls(): String = {
    val p = Files.createTempDirectory("graft-biff").resolve("legacy.xls")
    Files.write(p, buildCfb(workbookStream()))
    p.toString
  }

  test("S2b: BIFF8 .xls reads header + every cell record kind as text") {
    val df = BiffReader.readXls(spark, writeXls())
    assert(df.columns.toSeq ==
      Seq("name", "when", "qty", "city", "x✓", "SplitString", "flag",
        "fnum", "fstr", "fbool", "ferr"))
    val r = df.collect()(0)
    assert(r.getString(0) == "café")          // SST Latin-1 high byte
    assert(r.getString(1) == "2024-01-15 00:00:00") // date-styled NUMBER
    assert(r.getString(2) == "300")           // RK integer
    assert(r.getString(3) == "2.5")           // RK floating-point
    assert(r.getString(4) == "7")             // MULRK int
    assert(r.getString(5) == "2.5")           // MULRK ×1/100
    assert(r.getString(6) == "TRUE")          // BOOLERR boolean
    assert(r.getString(7) == "42.5")          // FORMULA numeric cached
    assert(r.getString(8) == "calc")          // FORMULA string via STRING
    assert(r.getString(9) == "TRUE")          // FORMULA boolean cached
    assert(r.isNullAt(10))                    // FORMULA error -> blank
  }

  test("S2b: Engine routes a real .xls through the BIFF reader (P11 + S2b)") {
    import org.apache.spark.sql.functions.col
    // the generated workbook's headers are not a member submission, so
    // route a corrupt-container case for the typed path and assert the
    // real file at least reaches the BIFF parser via isLegacyBiff
    val path = writeXls()
    assert(Ingest.isLegacyBiff(path))
    val df = BiffReader.readXls(spark, path)
    assert(df.count() == 1)
    // Engine-level: a truncated OLE2 magic-only file must fail inside
    // the BIFF reader with a container error, not the xlsx zip parser
    val stub = Files.createTempFile("graft", ".xls")
    Files.write(stub, Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1,
      0, 0, 0, 0).map(_.toByte))
    val dict = spark.range(1).select(col("id").cast("string").as("title"),
      col("id").cast("string").as("ext_id"))
    val e = intercept[IllegalArgumentException] {
      graft.Engine.processSubmission(spark, stub.toString, dict)
    }
    assert(e.getMessage.contains("OLE2"))
  }

  test("end-to-end: a legacy .xls member submission flows through Engine") {
    val xls = labelsWorkbook(Seq(
      Seq("Company Name", "Country", "E-Mail", "Street Address", "City",
        "Products Offered", "Ingredient List", "About"),
      Seq("Acme Foods", "USA", "a@b.co", "1 Main", "Springfield",
        "granola; Almond Milk", "salt", "We make food")))
    val p = Files.createTempDirectory("graft-biff-e2e").resolve("member.xls")
    Files.write(p, buildCfb(xls))
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dict = Seq(("Granola", "P-GRAN"), ("Almond Milk", "P-ALM"),
      ("Salt", "I-SALT")).toDF("title", "ext_id")
    val r = graft.Engine.processSubmission(spark, p.toString, dict)
    assert(r.mapping.missingRequired.isEmpty)
    assert(r.valid.count() == 1)
    val decisions = r.resolved.select("item_norm", "decision")
      .as[(String, String)].collect().toMap
    assert(decisions("Granola") == "resolved")
    assert(decisions("Almond Milk") == "resolved")
    assert(decisions("Salt") == "resolved")
  }

  test("end-to-end: formula-bearing .xls cells reach Engine with cached values") {
    // same member submission shape, but the products cell is a string
    // FORMULA (e.g. =TRIM(...)-cleaned column) — the cached value must
    // flow into resolution, not an empty cell
    def globals(sheetPos: Int): Array[Byte] = le(
      rec(0x0809, le(u16(0x0600), u16(0x0005), u16(0), u16(0), i32(0), i32(0))),
      rec(0x00E0, le(u16(0), u16(0), new Array[Byte](16))),
      rec(0x0085, le(i32(sheetPos), u16(0),
        Array[Byte](2, 0), "S1".getBytes("ISO-8859-1"))),
      rec(0x000A, Array.empty[Byte]))
    val header = Seq("Company Name", "Country", "E-Mail", "Street Address",
      "City", "Products Offered", "Ingredient List", "About")
    val plain = Seq("Acme Foods", "USA", "a@b.co", "1 Main", "Springfield")
    val sheet = le((Seq(
      rec(0x0809, le(u16(0x0600), u16(0x0010), u16(0), u16(0), i32(0), i32(0)))) ++
      header.zipWithIndex.map { case (v, c) => rec(0x0204, le(cellHead(0, c, 0), ustr(v))) } ++
      plain.zipWithIndex.map { case (v, c) => rec(0x0204, le(cellHead(1, c, 0), ustr(v))) } ++ Seq(
      formulaRec(1, 5, 0, fval(0, 0)),         // Products Offered = string formula
      rec(0x0207, ustr("granola; Almond Milk")),
      rec(0x0204, le(cellHead(1, 6, 0), ustr("salt"))),
      rec(0x0204, le(cellHead(1, 7, 0), ustr("We make food"))),
      rec(0x000A, Array.empty[Byte]))): _*)
    val g = globals(0)
    val p = Files.createTempDirectory("graft-biff-formula").resolve("member.xls")
    Files.write(p, buildCfb(globals(g.length) ++ sheet))
    import spark.implicits._
    val dict = Seq(("Granola", "P-GRAN"), ("Almond Milk", "P-ALM"),
      ("Salt", "I-SALT")).toDF("title", "ext_id")
    val r = graft.Engine.processSubmission(spark, p.toString, dict)
    assert(r.valid.count() == 1)
    val decisions = r.resolved.select("item_norm", "decision")
      .as[(String, String)].collect().toMap
    assert(decisions("Granola") == "resolved")
    assert(decisions("Almond Milk") == "resolved")
    assert(decisions("Salt") == "resolved")
  }

  test("corrupt-but-magic-valid .xls surfaces a typed rejection, not a parser crash") {
    // 600 bytes: valid OLE2 magic, garbage everywhere else — sector
    // chains point nowhere, the directory is noise
    val junk = new Array[Byte](600)
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
      .copyToArray(junk)
    (8 until 600).foreach(i => junk(i) = (i * 37 % 251).toByte)
    val p = Files.createTempDirectory("graft-biff-junk").resolve("junk.xls")
    Files.write(p, junk)
    val e = intercept[RuntimeException] {
      BiffReader.readXls(spark, p.toString)
    }
    // either the typed corrupt-workbook wrapper or a typed require
    // message — never a bare IndexOutOfBounds/BufferUnderflow
    assert(e.isInstanceOf[Ingest.UnsupportedFormat] ||
      e.isInstanceOf[IllegalArgumentException], e.toString)
  }

  test("case-folded routing: an upper-case .XLS submission reaches the BIFF reader") {
    import org.apache.spark.sql.functions.col
    val dict = spark.range(1).select(col("id").cast("string").as("title"),
      col("id").cast("string").as("ext_id"))
    // magic-only stub named .XLS: the whitelist accepts it case-
    // insensitively, and routing must hit the BIFF reader (its OLE2
    // container require), NOT fall through to the CSV parser
    val stub = Files.createTempDirectory("graft-ucase").resolve("DATA.XLS")
    Files.write(stub, Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1,
      0, 0, 0, 0).map(_.toByte))
    val e = intercept[IllegalArgumentException] {
      graft.Engine.processSubmission(spark, stub.toString, dict)
    }
    assert(e.getMessage.contains("OLE2"), e.toString)
  }

  test("RK decoding covers all four flag combinations") {
    assert(BiffReader.decodeRk((300 << 2) | 2) == 300.0)
    assert(BiffReader.decodeRk((250 << 2) | 2 | 1) == 2.5)
    assert(BiffReader.decodeRk(0x40040000) == 2.5)
    assert(BiffReader.decodeRk(0x40040000 | 1) == 0.025)
    assert(BiffReader.decodeRk((-12 << 2) | 2) == -12.0)
  }

  test("DATEMODE=1 (Mac 1904 system) shifts date cells to the 1904 epoch") {
    // a 1904-system workbook: DATEMODE record in globals, one
    // date-styled NUMBER cell. Ignoring the flag would render the
    // date ~4 years early (the openpyxl-divergence bug class).
    val serial = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(1904, 1, 1), java.time.LocalDate.of(2024, 6, 1))
    def globals(sheetPos: Int): Array[Byte] = le(
      rec(0x0809, le(u16(0x0600), u16(0x0005), u16(0), u16(0), i32(0), i32(0))),
      rec(0x0022, u16(1)), // DATEMODE: 1904 system
      rec(0x00E0, le(u16(0), u16(0), new Array[Byte](16))),  // XF0 General
      rec(0x00E0, le(u16(0), u16(14), new Array[Byte](16))), // XF1 date
      rec(0x0085, le(i32(sheetPos), u16(0),
        Array[Byte](2, 0), "S1".getBytes("ISO-8859-1"))),
      rec(0x000A, Array.empty[Byte]))
    val sheet = le(
      rec(0x0809, le(u16(0x0600), u16(0x0010), u16(0), u16(0), i32(0), i32(0))),
      rec(0x0204, le(cellHead(0, 0, 0), ustr("joined"))),
      rec(0x0203, le(cellHead(1, 0, 1), f64(serial.toDouble))),
      rec(0x000A, Array.empty[Byte]))
    val g = globals(0)
    val p = Files.createTempDirectory("graft-biff-1904").resolve("mac.xls")
    Files.write(p, buildCfb(globals(g.length) ++ sheet))
    val r = BiffReader.readXls(spark, p.toString).collect()(0)
    assert(r.getString(0) == "2024-06-01 00:00:00")
  }

  test("a BIFF5 (Excel 5.0/95) workbook is rejected typed, never garbled") {
    // same OLE2 container and record ids, BOF version 0x0500: BIFF5
    // strings carry no grbit byte, so BIFF8-layout parsing would
    // silently corrupt every text cell — must reject with the version
    val wb = rawWorkbook(
      Seq(rec(0x0204, le(cellHead(0, 0, 0), ustr("hello")))),
      bofVersion = 0x0500)
    val p = Files.createTempDirectory("graft-biff5").resolve("old.xls")
    Files.write(p, buildCfb(wb))
    val e = intercept[IllegalArgumentException] {
      BiffReader.readXls(spark, p.toString)
    }
    assert(e.getMessage.contains("0x0500"), e.getMessage)
  }

  test("blank rows with no records are densified (xlsx sparse-row parity)") {
    // BIFF emits NO records for blank rows: row 0 (the header) and the
    // interior row 2 are absent here — the grid must pad both, exactly
    // like the xlsx reader's r-attribute densification, instead of
    // promoting the first data row to header
    val wb = rawWorkbook(Seq(
      rec(0x0204, le(cellHead(1, 0, 0), ustr("v1"))),
      rec(0x0204, le(cellHead(1, 1, 0), ustr("w1"))),
      rec(0x0204, le(cellHead(3, 0, 0), ustr("v3")))))
    val p = Files.createTempDirectory("graft-sparse-xls").resolve("sparse.xls")
    Files.write(p, buildCfb(wb))
    val df = BiffReader.readXls(spark, p.toString)
    assert(df.columns.toSeq == Seq("col0", "col1"), df.columns.toSeq)
    val rows = df.collect()
    assert(rows.length == 3) // rows 1, 2 (blank), 3
    assert(rows(0).getString(0) == "v1" && rows(0).getString(1) == "w1")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
    assert(rows(2).getString(0) == "v3" && rows(2).isNullAt(1))
  }

  test("BLANK/MULBLANK styled-empty cells occupy grid slots (xlsx width parity)") {
    // xlsx registers <c s="..."/> as "" and the shared gridToDataFrame
    // widens the frame; the .xls twin's BLANK/MULBLANK must do the same
    // — a styled trailing blank in the header makes width 3 (col2
    // fallback name), and a MULBLANK run in a data row stays null cells
    val wb = rawWorkbook(Seq(
      rec(0x0204, le(cellHead(0, 0, 0), ustr("h1"))),
      rec(0x0204, le(cellHead(0, 1, 0), ustr("h2"))),
      rec(0x0201, le(cellHead(0, 2, 0))),                   // BLANK C1
      rec(0x0204, le(cellHead(1, 0, 0), ustr("v"))),
      // MULBLANK row 1, cols 1-2: row, first col, ixfe per col, last col
      rec(0x00BE, le(u16(1), u16(1), u16(0), u16(0), u16(2)))))
    val p = Files.createTempDirectory("graft-blank").resolve("blank.xls")
    Files.write(p, buildCfb(wb))
    val df = BiffReader.readXls(spark, p.toString)
    assert(df.columns.toSeq == Seq("h1", "h2", "col2"), df.columns.toSeq)
    val r = df.collect()(0)
    assert(r.getString(0) == "v" && r.isNullAt(1) && r.isNullAt(2))
  }
}
