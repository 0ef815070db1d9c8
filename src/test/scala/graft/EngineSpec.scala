package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The facade: one call from file to resolved items, review queue and
  * push plan — the API a reference user switches to. */
class EngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val dict = Seq(
    ("Granola", "P-GRAN"), ("Almond Milk", "P-ALM"),
    ("Salt", "I-SALT")).toDF("title", "ext_id")

  private def csvPath: String = {
    val dir = Files.createTempDirectory("graft-engine")
    val p = dir.resolve("m.csv")
    Files.writeString(p,
      """Company Name,Country,E-Mail,Street Address,City,Products Offered,Ingredient List,About
        |Acme,USA,a@b.co,1 Main,Springfield,"granola; Almond Milk",salt,We make food
        |BadCo<,>!,x@y.z,2 Oak,Town,Tea,sugar,Invalid name
        |""".stripMargin)
    p.toString
  }

  test("processSubmission runs file -> resolution in one call") {
    val r = Engine.processSubmission(spark, csvPath, dict)
    assert(r.mapping.missingRequired.isEmpty)
    assert(r.valid.count() == 1 && r.errors.count() == 1)
    val decisions = r.resolved.select("item_norm", "decision")
      .as[(String, String)].collect().toMap
    assert(decisions("Granola") == "resolved")
    assert(decisions("Almond Milk") == "resolved")
    assert(decisions("Salt") == "resolved")
  }

  test("reviewQueue + pushPlan derive the downstream sets") {
    val r = Engine.processSubmission(spark, csvPath, dict)
    val (pending, dash) = Engine.reviewQueue(r, "m.csv")
    assert(dash.collect()(0).getAs[Long]("total_pending") == pending.count())
    val existing = Seq(("Acme", "M1")).toDF("businessName", "member_ext_id")
    val (newDims, upd, ins) = Engine.pushPlan(r, dict, existing)
    assert(upd.count() == 1 && ins.count() == 0) // Acme exists -> update fork
    assert(newDims.columns.toSeq == Seq("title", "ext_id"))
  }
}
