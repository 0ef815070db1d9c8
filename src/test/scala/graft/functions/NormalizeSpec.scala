package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("normEmpty maps empty-ish tokens to null and trims the rest (P1)") {
    val in = Seq("", "null", "NULL", " none ", "n/a", "NA", "nan", " ok ", "x")
      .toDF("v")
    val out = in.select(Normalize.normEmpty($"v").as("n")).as[Option[String]].collect()
    assert(out.toSeq == Seq(None, None, None, None, None, None, None, Some("ok"), Some("x")))
  }

  test("WsTrimRe: the explicit class strips the same edges in BOTH engines " +
    "(vtab/formfeed in, NBSP out - the documented Python-strip divergence)") {
    // the class is spelled explicitly because Java \s includes \x0B
    // while RE2's does not; these fixtures pin the Spark side of the
    // contract (the DuckDB side is verified by the interpolated twins:
    // the SAME literal reaches both regex engines)
    val in = Seq("\u000Bok\u000B", "\fok", "\tok\n", "\u00A0ok", "o k",
      "\u000Bnull\r").toDF("v")
    val out = in.select(Normalize.normEmpty($"v").as("n"))
      .as[Option[String]].collect()
    assert(out.toSeq == Seq(
      Some("ok"),           // vtab edges strip (the \x0B the class adds)
      Some("ok"),           // formfeed edge strips
      Some("ok"),           // tab/newline edges strip
      Some("\u00A0ok"),     // NBSP survives - neither engine strips it
      Some("o k"),          // inner whitespace is never touched
      None))                // vtab/CR-edged 'null' still normalizes to NULL
  }

  test("sanitize strips tags then escapes entities (P5)") {
    val out = Seq("<b>Acme & Sons</b> <i>'best'</i>").toDF("v")
      .select(Normalize.sanitize($"v").as("s")).as[String].head()
    assert(out == "Acme &amp; Sons &#x27;best&#x27;")
  }

  test("business-name validation enforces length and charset (P3)") {
    val rows = Seq("ok co", "a", "x" * 201, "bad<tag>", "fine-name").toDF("v")
      .select(Normalize.validBusinessName($"v").as("ok")).as[Boolean].collect()
    assert(rows.toSeq == Seq(true, false, false, false, true))
  }

  test("email validation passes null and valid forms only (P4)") {
    val rows = Seq(Some("a@b.com"), None, Some("bad@"), Some("x@y.z.co"), Some("no-at"))
      .toDF("v").select(Normalize.validEmail($"v").as("ok")).as[Boolean].collect()
    assert(rows.toSeq == Seq(true, true, false, true, false))
  }

  test("three-band decision routing honors thresholds (F6)") {
    val rows = Seq(100.0, 97.0, 96.9, 50.0, 49.9).toDF("s")
      .select(Normalize.decisionBand($"s").as("d")).as[String].collect()
    assert(rows.toSeq == Seq("resolved", "resolved", "review", "review", "rejected"))
  }

  test("error categorization first-match-wins across 10 categories (F15)") {
    val cases = Seq(
      "connection timeout" -> "network",
      "permission denied" -> "auth",
      "type mismatch in column" -> "schema",
      "row already exists" -> "conflict",
      "rate limit hit" -> "quota",
      "malformed payload" -> "parse",
      "no such table" -> "missing",
      "out of memory oom" -> "resource",
      "weird failure" -> "generic",
      "all good" -> "unknown")
    val got = cases.map(_._1).toDF("m")
      .select(Normalize.errorCategory($"m").as("c")).as[String].collect()
    assert(got.toSeq == cases.map(_._2))
  }

  test("masking hits only long base64-ish strings (F13)") {
    val rows = Seq("shorttoken", "A" * 30, "has spaces " + "A" * 30).toDF("v")
      .select(Normalize.maskSensitive($"v").as("m")).as[String].collect()
    assert(rows.toSeq == Seq("shorttoken", "***MASKED***", "has spaces " + "A" * 30))
  }
}
