package graft.functions

import graft.SparkTestSession
import graft.operators.TextAnalysis
import graft.streaming.OpsLog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class TextAnalysisExtraSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("subwordCount splits camelCase, digits and punctuation runs") {
    val rows = Seq("helloWorld", "foo-bar baz42", "plain").toDF("t")
      .select(TextFunctions.subwordCount($"t").as("n")).as[Long].collect()
    assert(rows(0) == 2)  // hello | World
    assert(rows(1) >= 4)  // foo | - | bar | baz | 42
    assert(rows(2) == 1)
  }

  test("charNgramCount is length-based rolling-window count") {
    val rows = Seq("abcd", "ab", "").toDF("t")
      .select(TextFunctions.charNgramCount($"t", 3).as("n")).as[Long].collect()
    assert(rows.toSeq == Seq(2L, 0L, 0L))
  }

  test("analyze produces the full per-document projection on testdata") {
    val d = spark.read.parquet(s"${graft.SparkTestSession.sfDir}/documents.parquet")
    val out = TextAnalysis.analyze(d, "text")
    assert(Seq("n_tokens", "n_subwords", "quality_mills", "stopword_hits",
      "lang_pred", "fingerprint").forall(out.columns.contains))
    val r = out.orderBy("doc_id").limit(1).collect()(0)
    assert(r.getAs[Long]("n_tokens") > 0)
    assert(r.getAs[String]("fingerprint").length == 32)
  }

  test("normalizeOffering is idempotent on random inputs (property)") {
    val rnd = new scala.util.Random(7)
    val samples = (1 to 60).map { _ =>
      (1 to (1 + rnd.nextInt(4))).map { _ =>
        rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString +
          (if (rnd.nextBoolean()) "-" else " ")
      }.mkString
    }
    val once = samples.toDF("t")
      .select(OfferingText.normalizeOffering($"t").as("n")).as[String].collect()
    val twice = once.toSeq.toDF("t")
      .select(OfferingText.normalizeOffering($"t").as("n")).as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("log retention drops partitions older than the window (S10)") {
    val dir = Files.createTempDirectory("graft-logs").toString
    val logs = Seq(
      ("2024-01-01 10:00:00", "a"), ("2024-01-05 10:00:00", "b"),
      ("2024-01-20 10:00:00", "c")).toDF("ts_s", "message")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    OpsLog.append(logs, dir)
    OpsLog.enforceRetention(spark, dir, retentionDays = 7)
    val left = spark.read.parquet(dir).select("message").as[String].collect().toSet
    assert(left == Set("c")) // 01-01 and 01-05 are > 7 days before 01-20
  }

  test("JSON dimension scan reads a multiline country list (S4)") {
    val p = Files.createTempDirectory("graft-json").resolve("countries.json")
    Files.writeString(p,
      """{"data": {"queryMemberCountry": [
        |  {"title": "France", "id": "C1"},
        |  {"title": "Japan", "id": "C2"}
        |]}}""".stripMargin)
    val dim = graft.sources.Ingest.readJsonDim(spark, p.toString)
      .select(explode(col("data.queryMemberCountry")).as("c"))
      .select(col("c.title"), col("c.id"))
    assert(dim.as[(String, String)].collect().toSet ==
      Set(("France", "C1"), ("Japan", "C2")))
  }

  test("rolling fingerprint: deterministic, content-sensitive, codegen path") {
    val df = Seq("the quick brown fox", "the quick brown fox", "the quick brown fax", "")
      .toDF("t").select(TextHash.rollingFingerprint($"t").as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) == hs(1))          // deterministic
    assert(hs(0) != hs(2))          // single-char change flips the hash
    assert(hs(3) == 0L)             // empty text -> zero hash
    assert(hs.forall(h => h >= 0 && h < (1L << 61) - 1))
    // kernel and expression agree (interpreted vs codegen parity)
    assert(hs(0) == TextHash.rollingHashKernel(
      org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox")))
  }
}
