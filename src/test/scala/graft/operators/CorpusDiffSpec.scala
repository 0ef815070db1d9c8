package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot diff semantics: all four statuses, content-key
  * normalization (case/whitespace drift reads UNCHANGED), sentinel
  * keys for absent sides, and the bounded rollup. */
class CorpusDiffSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged with key normalization") {
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("id", "text")
    // 1 identical, 2 case+whitespace drift only, 3 real edit, 4 removed, 5 added
    val v2 = Seq((1L, "alpha"), (2L, "  BETA "), (3L, "gamma v2"), (5L, "eps"))
      .toDF("id", "text")
    val got = CorpusDiff.diff(v1, v2, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got.map(t => t._1 -> t._2).toSeq == Seq(
      1L -> "unchanged", 2L -> "unchanged", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    // sentinels: removed has no new_key, added no old_key
    assert(got.find(_._1 == 4L).get._4 == "")
    assert(got.find(_._1 == 5L).get._3 == "")
    // changed carries both real keys
    val c = got.find(_._1 == 3L).get
    assert(c._3.nonEmpty && c._4.nonEmpty && c._3 != c._4)

    val sum = CorpusDiff.diffSummary(CorpusDiff.diff(v1, v2, "id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L))
  }


  test("diff: a null-text doc is still PRESENT on its side") {
    val v1 = Seq((7L, Option.empty[String]), (8L, Some("x")),
      (9L, Option.empty[String]), (11L, Option.empty[String]))
      .toDF("id", "text")
    val v2 = Seq((7L, Some("hi")), (8L, Option.empty[String]),
      (10L, Option.empty[String]), (11L, Option.empty[String]))
      .toDF("id", "text")
    val got = CorpusDiff.diff(v1, v2, "id", "text")
      .select("id", "status").as[(Long, String)].collect().toMap
    // key-nullability presence would misread 7 as 'added' and 9 as
    // 'added'; the explicit side markers classify every case right
    assert(got == Map(
      7L -> "changed",   // NULL -> 'hi': present both sides, content differs
      8L -> "changed",   // 'x' -> NULL
      9L -> "removed",   // null-text doc present only in v1
      10L -> "added",    // null-text doc present only in v2
      11L -> "unchanged" // null-text on BOTH sides: same (absent) content
    ))
  }
}
