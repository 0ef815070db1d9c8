package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucket-blocked interval join: boundary semantics, losslessness vs
  * the naive range predicate, duplicate-freedom under overlapping
  * intervals, and the loud degenerate-interval guard.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("intervalJoin matches hand-picked boundary cases exactly") {
    val probe = Seq((1L, 10L), (2L, 19L), (3L, 20L), (4L, 25L), (5L, 9L))
      .toDF("pid", "ts")
    val iv = Seq(
      (100L, 10L, 20L), // [10,20): catches ts 10 and 19, NOT 20
      (101L, 15L, 26L), // overlaps: catches 19, 20, 25
      (102L, 30L, 30L), // empty: matches nothing
      (103L, 40L, 35L)) // inverted: matches nothing
      .toDF("iid", "s", "e")
    val got = RangeJoin.intervalJoin(probe, iv, "ts", "s", "e", 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L), (2L, 101L), (3L, 101L),
      (4L, 101L)))
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(probe, iv, "ts", "s", "e", 0L)
    }
    intercept[IllegalArgumentException] { // clashing column names
      RangeJoin.intervalJoin(probe, iv.withColumnRenamed("iid", "pid"),
        "ts", "s", "e", 4L)
    }
  }

  test("intervalJoin equals the naive range join on random data, duplicate-free") {
    val rnd = new scala.util.Random(23)
    val probe = (1L to 500L).map(i => (i, rnd.nextInt(10000).toLong))
      .toDF("pid", "ts")
    // overlapping intervals of mixed lengths, some empty
    val iv = (1L to 80L).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i, s, s + rnd.nextInt(800).toLong - 10L)
    }.toDF("iid", "s", "e")
    for (bucket <- Seq(1L, 7L, 100L, 5000L)) {
      val got = RangeJoin.intervalJoin(probe, iv, "ts", "s", "e", bucket)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq
      assert(got.size == got.toSet.size, s"duplicates at bucket=$bucket")
      val naive = probe.join(iv,
          probe("ts") >= iv("s") && probe("ts") < iv("e"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got.toSet == naive, s"mismatch at bucket=$bucket")
    }
  }

  test("a degenerate whole-domain interval fails loud, not with an exploded join") {
    val probe = Seq((1L, 5L)).toDF("pid", "ts")
    val iv = Seq((1L, 0L, 100000000L)).toDF("iid", "s", "e")
    val e = intercept[Exception] {
      RangeJoin.intervalJoin(probe, iv, "ts", "s", "e",
        bucketWidth = 10L, maxBucketsPerInterval = 100L).collect()
    }
    assert(e.getMessage != null)
  }
}
