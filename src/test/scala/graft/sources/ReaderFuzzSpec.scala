package graft.sources

import graft.SparkTestSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Property-based corruption fuzzing for the two zero-dependency binary
  * readers: arbitrary truncations and bit-flips of WELL-FORMED
  * workbooks must either parse (a flipped bit inside cell text is
  * legitimately different data) or surface as a TYPED ingest rejection
  * (`Ingest.UnsupportedFormat` or an `IllegalArgumentException` from a
  * `require`) — never a raw IndexOutOfBounds/BufferUnderflow/SAX/
  * NumberFormat escape from deep inside the parser, and never a hang.
  *
  * Seeds are pinned, so the byte-level corpus is identical on every
  * run — a green pass here is reproducible, not a lucky draw.
  */
class ReaderFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def xlsBytes: Array[Byte] =
    BiffTestWriter.buildCfb(BiffTestWriter.labelsWorkbook(Seq(
      Seq("businessName", "country1", "products"),
      Seq("Acme Foods", "USA", "granola; almond milk"),
      Seq("Bob's Bakery", "DE", "bread"))))

  private def xlsxBytes: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets><sheet name="S1" sheetId="1"/></sheets></workbook>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4"><si><t>businessName</t></si><si><t>country1</t></si><si><t>Acme Foods</t></si><si><t>USA</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>7.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    bos.toByteArray
  }

  /** Truncate the workbook at any byte boundary (including 0). */
  private def truncations(base: Array[Byte]): Gen[Array[Byte]] =
    Gen.choose(0, base.length - 1).map(base.take)

  /** Flip 1–8 random bits anywhere in the workbook. */
  private def bitFlips(base: Array[Byte]): Gen[Array[Byte]] =
    for {
      n <- Gen.choose(1, 8)
      idxs <- Gen.listOfN(n, Gen.choose(0, base.length * 8 - 1))
    } yield {
      val b = base.clone()
      idxs.foreach(i => b(i / 8) = (b(i / 8) ^ (1 << (i % 8))).toByte)
      b
    }

  /** true iff the reader parses OR rejects with a typed error. */
  private def typedOrParsed(bytes: Array[Byte], suffix: String,
      read: String => Unit): Boolean = {
    val p = Files.createTempFile("graft-fuzz", suffix)
    try {
      Files.write(p, bytes)
      try { read(p.toString); true }
      catch {
        case _: Ingest.UnsupportedFormat => true
        case e: IllegalArgumentException =>
          // the typed-require channel — but a raw NumberFormatException
          // must have been reclassified by the reader, never escape
          !e.isInstanceOf[NumberFormatException]
        case e: Throwable =>
          info(s"raw escape for $suffix: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
    } finally Files.deleteIfExists(p)
  }

  private def checkProp(prop: Prop, seed: Long): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(300)
        .withInitialSeed(Seed(seed)),
      prop)
    assert(res.passed, res.status.toString)
  }

  test("xls: truncations are parsed-or-typed-rejected, never raw") {
    val base = xlsBytes
    checkProp(Prop.forAll(truncations(base)) { b =>
      typedOrParsed(b, ".xls", p => BiffReader.readXls(spark, p))
    }, seed = 101L)
  }

  test("xls: bit-flips are parsed-or-typed-rejected, never raw") {
    val base = xlsBytes
    checkProp(Prop.forAll(bitFlips(base)) { b =>
      typedOrParsed(b, ".xls", p => BiffReader.readXls(spark, p))
    }, seed = 102L)
  }

  test("xlsx: truncations are parsed-or-typed-rejected, never raw") {
    val base = xlsxBytes
    checkProp(Prop.forAll(truncations(base)) { b =>
      typedOrParsed(b, ".xlsx", p => ExcelReader.readXlsx(spark, p))
    }, seed = 103L)
  }

  test("xlsx: bit-flips are parsed-or-typed-rejected, never raw") {
    val base = xlsxBytes
    checkProp(Prop.forAll(bitFlips(base)) { b =>
      typedOrParsed(b, ".xlsx", p => ExcelReader.readXlsx(spark, p))
    }, seed = 104L)
  }

  test("the fuzz harness still accepts the well-formed baselines") {
    // guards the properties against vacuous passes: the uncorrupted
    // workbooks must parse through the same harness path
    assert(typedOrParsed(xlsBytes, ".xls",
      p => BiffReader.readXls(spark, p)))
    assert(typedOrParsed(xlsxBytes, ".xlsx",
      p => ExcelReader.readXlsx(spark, p)))
  }
}
