package graft.schema

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import Model._

  test("typed Dataset round-trips the review model with tri-state approval") {
    val reviews = Seq(
      MatchReview(1L, 10L, Some("Granola"), Some("P1"), 92.0, None, ignored = false,
        Seq(Alternative("Granola Mix", 88.0, "P2"))),
      MatchReview(2L, 11L, Some("Salt"), Some("I1"), 45.0, Some(false), ignored = true, Nil),
      MatchReview(3L, 12L, None, None, 60.0, Some(true), ignored = false, Nil))
      .toDS()
    val pending = reviews.filter(r => r.approved.isEmpty && !r.ignored)
    assert(pending.count() == 1 && pending.head().review_id == 1L)
    val decisions = reviews.map(decisionOf).collect().toSeq
    assert(decisions == Seq("pending", "auto-rejected", "approved-as-new"))
  }

  test("decision enum covers every tri-state combination") {
    def r(ig: Boolean, ap: Option[Boolean], sug: Option[String]) =
      MatchReview(0L, 0L, sug, sug, 50.0, ap, ig, Nil)
    assert(decisionOf(r(true, Some(false), Some("x"))) == "auto-rejected")
    assert(decisionOf(r(true, None, None)) == "ignored")
    assert(decisionOf(r(false, None, Some("x"))) == "pending")
    assert(decisionOf(r(false, Some(true), Some("x"))) == "approved-match")
    assert(decisionOf(r(false, Some(true), None)) == "approved-as-new")
    assert(decisionOf(r(false, Some(false), None)) == "rejected")
  }

  test("canonical member schema accepts a mapped projection") {
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row("Acme", "a@b.co", "USA", null, null, null,
          null, null, null, null, "Granola", "salt", null, null, "yes", null)),
      Model.CanonicalMemberSchema)
    assert(df.schema("businessName").nullable == false)
    assert(df.count() == 1)
  }
}
