package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming upsert merges micro-batches into a keyed target") {
    val in = Files.createTempDirectory("sm-in").toString
    val cp = Files.createTempDirectory("sm-cp").toString
    val target = Files.createTempDirectory("sm-t").toString + "/table"

    val b1 = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("key", "name", "v")
    b1.write.mode("append").parquet(in)
    StreamingMerge.run(spark, in, b1.schema, cp, target,
      Seq("key"), Seq("name", "v"))
    assert(spark.read.parquet(target).count() == 2)

    // second file: update key 2, insert key 3 — exactly-once across runs
    Seq((2L, "b", 21L), (3L, "c", 30L)).toDF("key", "name", "v")
      .write.mode("append").parquet(in)
    StreamingMerge.run(spark, in, b1.schema, cp, target,
      Seq("key"), Seq("name", "v"))
    val out = spark.read.parquet(target)
      .orderBy("key").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 10L), (2L, "b", 21L), (3L, "c", 30L)))

    // re-run with no new files: no-op (idempotent)
    StreamingMerge.run(spark, in, b1.schema, cp, target,
      Seq("key"), Seq("name", "v"))
    assert(spark.read.parquet(target).count() == 3)
  }
}
