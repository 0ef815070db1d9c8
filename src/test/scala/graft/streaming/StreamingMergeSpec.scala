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

  test("streaming CDC apply composes: batched = one-shot on seq-ordered logs") {
    import graft.operators.Merge
    val dir = Files.createTempDirectory("cdc").toString
    val snap = s"$dir/snap"; val in = s"$dir/in"
    val cp = s"$dir/cp"; val target = s"$dir/state"
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("k", "name", "v").write.parquet(snap)
    // three seq-ordered op files (maxFilesPerTrigger=1 → 3 micro-batches):
    // update, tombstone, then a late update + a fresh insert
    val ops1 = Seq((1L, 100L, "U", 11L), (2L, 101L, "U", 21L))
    val ops2 = Seq((2L, 200L, "D", 0L), (3L, 201L, "U", 31L))
    val ops3 = Seq((3L, 300L, "U", 32L), (5L, 301L, "U", 50L))
    // append each op set as ONE part file (the file source reads bare
    // files, not nested dirs) in mtime order → one micro-batch each
    Seq(ops1, ops2, ops3).foreach { o =>
      o.toDF("k", "seq", "op", "v").coalesce(1)
        .write.mode("append").parquet(in)
      Thread.sleep(50)
    }
    StreamingMerge.runCdc(spark, in,
      ops1.toDF("k", "seq", "op", "v").schema, cp, target, snap,
      "k", "seq", "op")
    val streamed = spark.read.parquet(target)
      .select("k", "name", "v").orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    val oneShot = Merge.applyCdc(
        spark.read.parquet(snap),
        (ops1 ++ ops2 ++ ops3).toDF("k", "seq", "op", "v"),
        "k", "seq", "op")
      .select("k", "name", "v").orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(streamed == oneShot, s"$streamed vs $oneShot")
    assert(streamed == Seq((1L, "a", 11L), (3L, "c", 32L),
      (4L, "d", 40L), (5L, null, 50L)))
  }

  test("streaming CDC: cross-batch D-then-U resurrects WITHOUT snapshot columns") {
    import graft.operators.Merge
    val dir = Files.createTempDirectory("cdc2").toString
    val snap = s"$dir/snap"; val in = s"$dir/in"
    val cp = s"$dir/cp"; val target = s"$dir/state"
    Seq((1L, "a", 10L)).toDF("k", "name", "v").write.parquet(snap)
    val ops1 = Seq((1L, 100L, "D", 0L))
    val ops2 = Seq((1L, 200L, "U", 12L))
    Seq(ops1, ops2).foreach { o =>
      o.toDF("k", "seq", "op", "v").coalesce(1)
        .write.mode("append").parquet(in)
      Thread.sleep(50)
    }
    StreamingMerge.runCdc(spark, in,
      ops1.toDF("k", "seq", "op", "v").schema, cp, target, snap,
      "k", "seq", "op")
    val streamed = spark.read.parquet(target)
      .select("k", "name", "v").as[(Long, String, Long)].collect().toSeq
    // incremental: the delete really removed the snapshot row, so the
    // later upsert re-inserts payload-only (name null)
    assert(streamed == Seq((1L, null, 12L)))
    // one-shot: the whole log is visible at once — the late U
    // supersedes the D and the snapshot's name survives
    val oneShot = Merge.applyCdc(spark.read.parquet(snap),
        (ops1 ++ ops2).toDF("k", "seq", "op", "v"), "k", "seq", "op")
      .select("k", "name", "v").as[(Long, String, Long)].collect().toSeq
    assert(oneShot == Seq((1L, "a", 12L)))
  }

  test("streaming CDC recovers a mid-swap crash from the aside dir") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("cdc3").toString
    val snap = s"$dir/snap"; val in = s"$dir/in"
    val cp = s"$dir/cp"; val target = s"$dir/state"
    Seq((1L, "a", 10L)).toDF("k", "name", "v").write.parquet(snap)
    Seq((1L, 100L, "U", 11L)).toDF("k", "seq", "op", "v").coalesce(1)
      .write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    StreamingMerge.runCdc(spark, in, schema, cp, target, snap,
      "k", "seq", "op")
    // simulate a crash between the swap's two renames: the live target
    // was moved aside but the new one never landed. The committed
    // checkpoint will NOT replay the batch — with the old catch-all
    // fallback the next run would silently reset to the ORIGINAL
    // snapshot (v=10), permanently dropping the committed op.
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new Path(target), new Path(target + "__old")))
    Seq((2L, 200L, "U", 20L)).toDF("k", "seq", "op", "v").coalesce(1)
      .write.mode("append").parquet(in)
    StreamingMerge.runCdc(spark, in, schema, cp, target, snap,
      "k", "seq", "op")
    val out = spark.read.parquet(target)
      .select("k", "name", "v").orderBy("k")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "a", 11L), (2L, null, 20L)),
      s"recovered state must keep the committed op: $out")
    // the successful swap clears the aside dir
    assert(!fs.exists(new Path(target + "__old")))
  }
}
