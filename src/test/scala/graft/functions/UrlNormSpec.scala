package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** URL canonicalization: every rule, the separator-anchoring edge, and
  * idempotence (a canonical form must be a fixed point — re-canonizing
  * a stored key can never change it).
  */
class UrlNormSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def canon(us: String*): Seq[String] =
    us.toDF("u").select(UrlNorm.canonicalizeUrl(col("u"))).as[String]
      .collect().toSeq

  test("each canonicalization rule fires, separately and stacked") {
    assert(canon("  HTTPS://WWW.Ex.COM/A  ") == Seq("https://ex.com/a"))
    assert(canon("https://ex.com/a#frag?not-a-query") == Seq("https://ex.com/a"))
    assert(canon("https://ex.com/a?utm_source=x&q=1") == Seq("https://ex.com/a?q=1"))
    assert(canon("https://ex.com/a?q=1&gclid=z") == Seq("https://ex.com/a?q=1"))
    assert(canon("https://ex.com/a?fbclid=z") == Seq("https://ex.com/a"))
    assert(canon("https://ex.com/a?utm_a=1&utm_b=2&q=3") ==
      Seq("https://ex.com/a?q=3"))
    assert(canon("https://ex.com/a?utm_a=1&utm_b=2") == Seq("https://ex.com/a"))
    assert(canon("https://ex.com/a///") == Seq("https://ex.com/a"))
    assert(canon("HTTP://WWW.EX.COM/") == Seq("http://ex.com"))
  }

  test("tracking removal is separator-anchored — never fires mid-value") {
    // 'xgclid=5' inside a value must survive; a real &gclid must not
    assert(canon("https://ex.com/a?q=xgclid=5&gclid=1") ==
      Seq("https://ex.com/a?q=xgclid=5"))
    // a path segment that LOOKS like a param is untouched
    assert(canon("https://ex.com/utm_source=fake/page") ==
      Seq("https://ex.com/utm_source=fake/page"))
  }

  test("canonicalization is idempotent and urlHost extracts the authority") {
    val urls = Seq(
      "  HTTPS://WWW.Ex.COM/A/?utm_a=1&b=2#f ", "http://a.b.c/x?gclid=1",
      "https://ex.com", "ftp://files.ex.org/pub/", "not a url at all")
    val once = canon(urls: _*)
    val twice = once.toDF("u").select(UrlNorm.canonicalizeUrl(col("u")))
      .as[String].collect().toSeq
    assert(once == twice, "canonical form is not a fixed point")
    val hosts = once.toDF("u").select(UrlNorm.urlHost(col("u")))
      .as[String].collect().toSeq
    assert(hosts == Seq("ex.com", "a.b.c", "ex.com", "files.ex.org", ""))
  }
}
