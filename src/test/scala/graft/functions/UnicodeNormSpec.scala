package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Explicit \u escapes throughout — source-level composed vs decomposed
  * characters are visually identical, which is precisely the bug class
  * under test. */
class UnicodeNormSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val composedE = "caf\u00e9"      // \u00e9 as one codepoint
  private val decomposedE = "cafe\u0301"   // e + combining acute U+0301

  private def runNfc(s: String): String =
    Seq(s).toDF("t").select(UnicodeNorm.nfc_normalize(col("t"))).as[String].head()

  test("NFC composes decomposed sequences and is identity on composed/ASCII") {
    assert(runNfc(decomposedE) == composedE)
    assert(runNfc(composedE) == composedE)
    assert(runNfc("no\u0308el") == "n\u00f6el")
    assert(runNfc("plain ascii 123") == "plain ascii 123")
    assert(runNfc("") == "")
  }

  test("NFC expression is null-preserving and survives codegen over a column") {
    val df = Seq(Some(decomposedE), None, Some("ok")).toDF("t")
      .select(UnicodeNorm.nfc_normalize(col("t")).as("n"))
    assert(df.as[Option[String]].collect().toSeq ==
      Seq(Some(composedE), None, Some("ok")))
  }

  test("cleanText strips Cc/Cf, collapses whitespace, and is idempotent") {
    // ZWJ (Cf), TAB (Cc), decomposed accent, trailing spaces
    val messy = "ab  c\u200Dd\te\u0301  "
    val once = Seq(messy).toDF("t")
      .select(UnicodeNorm.cleanText(col("t"))).as[String].head()
    assert(once == "ab c d \u00e9")
    val twice = Seq(once).toDF("t")
      .select(UnicodeNorm.cleanText(col("t"))).as[String].head()
    assert(twice == once, "cleanText must be idempotent")
  }

  test("canonically-equal texts hash together after cleanText, apart before") {
    val df = Seq((1L, composedE + " star"), (2L, decomposedE + " star"))
      .toDF("id", "t")
    val raw = df.select(TextFunctions.contentKey(col("t"))).distinct().count()
    val cleaned = df.select(
      TextFunctions.contentKey(UnicodeNorm.cleanText(col("t")))).distinct().count()
    assert(raw == 2 && cleaned == 1,
      "NFC canonicalization must unify composed/decomposed duplicates")
  }
}
