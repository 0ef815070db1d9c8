package graft

import graft.functions.{Normalize, OfferingText}
import graft.operators._
import graft.sources.Ingest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** SURVEY §7.2 minimum end-to-end slice: a messy member-submission CSV
  * through header mapping → null-normalization → validation split →
  * offerings → item explode → entity resolution → reports. Exercises
  * S1, P1-P7, E1-E4, J1-J2, W1-W3, F1-F6, A1-A3 in one flow, on the
  * FIXTURES.md edge cases (messy headers, null tokens, multi-valued
  * duplicates, all three match bands, invalid rows).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeFixture(name: String, content: String,
      cs: java.nio.charset.Charset = StandardCharsets.UTF_8): String = {
    val dir = Files.createTempDirectory("graft-fix")
    val p = dir.resolve(name)
    Files.write(p, content.getBytes(cs))
    p.toString
  }

  val messyCsv: String =
    """Company Name,Country,E-Mail,Street Address,City,Products Offered,Ingredient List,About,Manufacturing
      |Acme Foods,USA,info@acme.com,1 Main St,Springfield,"Granola; granola, GRANOLA ; vit c drink",salt; pepper,We make food,yes
      |,USA,x@y.com,2 Oak Ave,Shelbyville,Tea,sugar,No name -> dropped,
      |B,Canada,not-an-email,3 Elm St,Ottawa,"Almond Milk",n/a,Name too short -> dropped,
      |Tasty Ltd,null,a@b.co,4 Pine Rd,Toronto,"Oat Milk",salt,Null country -> dropped,
      |Best Bakery,UK,,5 Ash Ln,Leeds,"whole wheat bread; Bread",flour; NaN,Bakers,yes
      |""".stripMargin

  lazy val dict = Seq(
    ("Granola", "P-GRAN"),
    ("Vitamin C Drink", "P-VITC"),
    ("Whole Wheat Bread", "P-WWB"),
    ("Almond Milk", "P-ALM"),
    ("Salt", "I-SALT"),
    ("Pepper", "I-PEP"),
    ("Flour", "I-FLR")).toDF("title", "ext_id")

  test("end-to-end: ingest -> map -> validate -> explode -> resolve -> report") {
    val path = writeFixture("members.csv", messyCsv)

    // S1: encoding-probed scan
    val raw = Ingest.readCsv(spark, path)
    assert(raw.count() == 5)

    // J8/P6/P7: header mapping + projection
    val mapping = HeaderMapper.mapHeaders(raw.columns.toSeq)
    assert(mapping.missingRequired.isEmpty, mapping.missingRequired.toString)
    val projected = HeaderMapper.projection(raw, mapping)
    assert(projected.columns.contains("businessName"))
    assert(projected.columns.contains("manufacturingServices"))

    // P1: null normalization on every string column
    val normed = projected.columns.foldLeft(projected) { (df, c) =>
      df.withColumn(c, Normalize.normEmpty(col(c)))
    }

    // P2/P3: validation split (valid rows vs error branch, one pass)
    val flagged = normed.withColumn("__valid",
      Normalize.validBusinessName(col("businessName")) &&
        col("country1").isNotNull)
    val valid = flagged.where(col("__valid")).drop("__valid")
      .withColumn("member_id", monotonically_increasing_id())
    val errors = flagged.where(!col("__valid")).drop("__valid")
      .withColumn("error_message",
        when(!Normalize.validBusinessName(col("businessName")), "invalid business name")
          .otherwise("missing country"))
    assert(valid.count() == 2)  // Acme Foods, Best Bakery
    assert(errors.count() == 3)

    // E3: offerings (both survivors have manufacturing)
    val offerings = Offerings.offeringLinks(valid, Seq("member_id"))
    assert(offerings.where(col("uid") === "0x2c411f").count() == 2)

    // E1/E2/E4: item explode with within-row dedup
    val items = ItemExplode.explodeItems(valid, Seq("member_id"),
      Seq("product" -> "products", "ingredient" -> "ingredients"))
    val acmeProducts = items
      .join(valid.where(col("businessName") === "Acme Foods"), Seq("member_id"), "left_semi")
      .where(col("kind") === "product")
    assert(acmeProducts.count() == 2) // Granola (deduped x3) + vit c drink

    // F1: normalize item names, then resolve (J1/J2/W1-W3/F2-F6)
    val normalizedItems = items.withColumn(
      "item_norm", OfferingText.normalizeOffering(col("item_name")))
    val resolved = EntityResolution.resolve(
      normalizedItems, dict, Seq("member_id", "kind", "item_key"),
      itemCol = "item_norm")
    val byName = resolved
      .select("item_norm", "decision", "ext_id", "score")
      .collect().map(r => r.getString(0) -> r).toMap

    // exact after F1 variant rewrite: "vit c drink" -> "Vitamin C Drink"
    assert(byName("Vitamin C Drink").getAs[String]("decision") == "resolved")
    assert(byName("Vitamin C Drink").getAs[String]("ext_id") == "P-VITC")
    assert(byName("Granola").getAs[String]("decision") == "resolved")
    // "Bread" vs "Whole Wheat Bread": token-subset scores 100 raw, but the
    // disagreement + length + word-count penalties (F4/F5, mirroring the
    // reference's) push it under the reject floor
    assert(byName("Bread").getAs[String]("decision") == "rejected")
    assert(byName.contains("Whole Wheat Bread"))
    assert(byName("Whole Wheat Bread").getAs[String]("decision") == "resolved")

    // A1-A3: dashboard over the pending set
    val pending = resolved.where(col("decision") === "review")
      .withColumn("submission_name", lit("members.csv"))
      .join(valid.select(col("member_id"), col("businessName").as("member_name")), Seq("member_id"))
    val dash = Reports.reviewDashboard(pending).collect()(0)
    assert(dash.getAs[Long]("total_pending") == pending.count())

    // U1: error report union (etl + push) categorizes
    val pushErrors = Seq(("Best Bakery", "connection timeout"))
      .toDF("businessName", "error_message")
    val report = Reports.errorReport(
      errors.select("businessName", "error_message"), pushErrors)
    assert(report.where(col("category") === "network").count() == 1)
  }

  test("encoding ladder: latin-1 bytes are detected and read (S1)") {
    val content = "businessName,country1\nCafé Olé,France\n"
    val path = writeFixture("latin1.csv", content, StandardCharsets.ISO_8859_1)
    assert(Ingest.detectEncoding(path) != "UTF-8")
    val df = Ingest.readCsv(spark, path)
    assert(df.select("businessName").as[String].head() == "Café Olé")
  }

  test("utf-8 with BOM reads cleanly (S1)") {
    val content = "﻿businessName,country1\nAcme,US\n"
    val path = writeFixture("bom.csv", content, StandardCharsets.UTF_8)
    assert(Ingest.detectEncoding(path) == "UTF-8")
    val df = Ingest.readCsv(spark, path)
    assert(df.count() == 1)
  }

  test("probe cut mid-multibyte-character still detects UTF-8 (S1)") {
    // 'é' placed so its two UTF-8 bytes straddle the 1024-byte probe
    // boundary: a REPORT-mode decoder sees a malformed tail and — before
    // the truncation-forgiveness fix — fell through to windows-1252,
    // mojibake-ing the whole file. Genuine malformedness mid-window must
    // still be rejected (second assert).
    val content = "businessName,country1\n" + ("x" * (1023 - 22)) + "é more text here\n"
    assert(content.getBytes(StandardCharsets.UTF_8)(1023) != 'x'.toByte)
    val path = writeFixture("cut.csv", content, StandardCharsets.UTF_8)
    assert(Ingest.detectEncoding(path) == "UTF-8")
    val latin = writeFixture("latin-mid.csv",
      "businessName,country1\nCafé,FR\n" + ("y" * 1100),
      StandardCharsets.ISO_8859_1)
    assert(Ingest.detectEncoding(latin) != "UTF-8")
  }

  test("xlsx container validation rejects non-zip payloads (S3)") {
    val bad = writeFixture("fake.xlsx", "this is not a zip")
    assert(Ingest.validateXlsxContainer(bad).isLeft)
  }


  test("encoding ladder mirrors the reference: non-UTF-8 decodes as latin-1") {
    // 0x92 is cp1252's right single quote but latin-1's U+0092 control:
    // the reference probes latin-1 FIRST (app/etl.py:21, and latin-1
    // accepts every byte), so parity demands ISO-8859-1 here — a
    // windows-1252-first ladder would silently change every 0x80-0x9F
    // byte of every non-UTF-8 submission
    val dir = java.nio.file.Files.createTempDirectory("graft-enc")
    val path = dir.resolve("quote.csv")
    val bytes = "businessName,c\nO".getBytes(StandardCharsets.ISO_8859_1) ++
      Array(0x92.toByte) ++ "Brien,IE\n".getBytes(StandardCharsets.ISO_8859_1)
    java.nio.file.Files.write(path, bytes)
    assert(Ingest.detectEncoding(path.toString) == "ISO-8859-1")
  }

  test("isSafeFilename: an invalid path (NUL byte) is unsafe, not a crash") {
    val up = java.nio.file.Files.createTempDirectory("graft-up").toString
    assert(!Ingest.isSafeFilename(up, "a\u0000b.csv"))
  }
}
