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

  test("end-to-end on the reference's own labeled corpus (fidelity)") {
    // real canonical titles from the reference seed data, fed through
    // the FULL pipeline (csv -> headers -> explode -> resolve)
    val corpus = graft.sources.ExcelReader.readXlsx(
      spark, "/root/reference/seed_data/Training Data + Matching IDs.xlsx", sheet = 1)
    val Seq(titleCol, uidCol) = corpus.columns.take(2).toSeq
    val refDict = corpus
      .select(col(s"`$titleCol`").as("title"), col(s"`$uidCol`").as("ext_id"))
      .where(col("title").isNotNull && col("ext_id").isNotNull)
    val titles = refDict.select("title").as[String].collect()
      .filter(t => !t.exists(";,\"\n".contains(_)) && t.trim.nonEmpty)
      .take(25)
    assert(titles.length == 25, "corpus too small for the fixture")
    val dir = Files.createTempDirectory("graft-ref-e2e")
    val p = dir.resolve("ref.csv")
    Files.writeString(p,
      "Company Name,Country,E-Mail,Street Address,City,Products Offered,Ingredient List,About\n" +
        s"""RefCo,USA,r@ref.co,1 Ref Way,Reftown,"${titles.mkString("; ")}",,Reference corpus fixture\n""")
    val r = Engine.processSubmission(spark, p.toString, refDict)
    val n = r.resolved.count()
    assert(n >= 25, s"explode lost items: $n")
    val resolvedOrReview = r.resolved
      .where(col("decision") =!= "rejected").count()
    // the reference's own vocabulary must overwhelmingly match itself;
    // normalizeOffering rewrites a small tail into review territory
    assert(resolvedOrReview >= (n * 0.8).toLong,
      s"only $resolvedOrReview of $n corpus titles matched their own dictionary")
  }

  test("P11 is ENFORCED by processSubmission: whitelist + traversal guard") {
    // disallowed extension -> typed rejection before any read
    val bad = intercept[graft.sources.Ingest.UnsupportedFormat] {
      Engine.processSubmission(spark, "/tmp/evil.sh", dict)
    }
    assert(bad.getMessage.contains("extension not allowed"))
    // a submission escaping the upload root -> typed rejection
    val esc = intercept[graft.sources.Ingest.UnsupportedFormat] {
      Engine.processSubmission(spark, "../outside.csv", dict,
        uploadRoot = Some("/tmp/graft-uploads"))
    }
    assert(esc.getMessage.contains("unsafe submission filename"))
    // an absolute path is also outside any root
    intercept[graft.sources.Ingest.UnsupportedFormat] {
      Engine.processSubmission(spark, "/etc/passwd.csv", dict,
        uploadRoot = Some("/tmp/graft-uploads"))
    }
    // a safe relative filename under the root still processes
    val root = Files.createTempDirectory("graft-p11")
    Files.writeString(root.resolve("ok.csv"),
      """Company Name,Country,E-Mail,Street Address,City,Products Offered,Ingredient List,About
        |Acme,USA,a@b.co,1 Main,Springfield,granola,salt,We make food
        |""".stripMargin)
    val r = Engine.processSubmission(spark, "ok.csv", dict,
      uploadRoot = Some(root.toString))
    assert(r.valid.count() == 1)
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
