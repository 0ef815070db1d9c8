package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 history-build semantics: null-safe change detection, 1-based
  * versions, half-open validity intervals ordered by version (not
  * valid_from, so same-ts boundaries stay deterministic), collapsed row
  * counts — each checked against a naive driver-side fold.
  */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("buildHistory opens versions on null-safe changes only") {
    val log = Seq(
      (1L, 10L, 1L, Some("a")), (1L, 20L, 2L, Some("a")),
      (1L, 30L, 3L, None), (1L, 40L, 4L, None),
      (1L, 50L, 5L, Some("b")), (2L, 10L, 6L, Some("x")))
      .toDF("k", "ts", "id", "attr")
    val got = Scd2.buildHistory(log, Seq("k"), Seq("attr"), "ts", Seq("id"))
      .orderBy("k", "version_no").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4),
        r.getBoolean(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (1L, 1L, Some("a"), 10L, 30L, false, 2L),
      (1L, 2L, None, 30L, 50L, false, 2L),
      (1L, 3L, Some("b"), 50L, -1L, true, 1L),
      (2L, 1L, Some("x"), 10L, -1L, true, 1L)))
  }

  test("same-ts version boundaries are ordered by the tie-breaker") {
    val log = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"))
      .toDF("k", "ts", "id", "attr")
    val got = Scd2.buildHistory(log, Seq("k"), Seq("attr"), "ts", Seq("id"))
      .orderBy("version_no").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    // version 1 is closed AT its own start (empty interval) — the
    // documented same-ts edge; version 2 is current
    assert(got.toSeq == Seq((1L, "a", 10L, 10L, false), (2L, "b", 10L, -1L, true)))
  }

  test("a first row with all-null attrs still opens version 1") {
    // null <=> lag(=null) is TRUE, so attr-change detection alone
    // would leave the first row versionless (0-based history) — the
    // structural first-row term must open the version
    val log = Seq((1L, 10L, 1L, None: Option[String]),
      (1L, 20L, 2L, Some("a"))).toDF("k", "ts", "id", "attr")
    val got = Scd2.buildHistory(log, Seq("k"), Seq("attr"), "ts", Seq("id"))
      .orderBy("version_no").collect()
      .map(r => (r.getLong(1), Option(r.getString(2)), r.getLong(3)))
    assert(got.toSeq == Seq((1L, None, 10L), (2L, Some("a"), 20L)))
  }

  test("null timestamps: is_current marks only the structural last version") {
    // null ts sorts first, making interior valid_from (and the
    // predecessor's valid_to) null — nullness of valid_to must NOT be
    // what marks currency, or this key would have two current versions
    val log = Seq(
      (1L, None: Option[Long], 1L, "a"), (1L, None: Option[Long], 2L, "b"),
      (1L, Some(10L), 3L, "c")).toDF("k", "ts", "id", "attr")
    val got = Scd2.buildHistory(log, Seq("k"), Seq("attr"), "ts", Seq("id"))
      .orderBy("version_no").collect()
      .map(r => (r.getLong(1), r.getString(2),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1L, "a", -1L, false), (2L, "b", 10L, false), (3L, "c", -1L, true)))
  }

  test("buildHistory rejects reserved column names and empty specs") {
    val df = Seq((1L, 1L, "a")).toDF("k", "ts", "valid_from")
    intercept[IllegalArgumentException] {
      Scd2.buildHistory(df, Seq("k"), Seq("valid_from"), "ts")
    }
    val ok = Seq((1L, 1L, "a")).toDF("k", "ts", "attr")
    intercept[IllegalArgumentException] {
      Scd2.buildHistory(ok, Seq.empty, Seq("attr"), "ts")
    }
    intercept[IllegalArgumentException] {
      Scd2.buildHistory(ok, Seq("k"), Seq.empty, "ts")
    }
  }

  test("q82 matches a naive per-user fold on the sf fixture") {
    val dir = SparkTestSession.sfDir
    val got = graft.SparkEntry.queries("q82_scd2_history")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6))).toSeq
    val ev = graft.Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val versions = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
      for ((_, us, _, tp) <- sorted) {
        if (versions.nonEmpty && versions.last._1 == tp) {
          val l = versions.last
          versions(versions.size - 1) = (l._1, l._2, l._3 + 1)
        } else versions += ((tp, us, 1L))
      }
      versions.zipWithIndex.map { case ((tp, from, n), i) =>
        val to = if (i + 1 < versions.size) versions(i + 1)._2 else -1L
        (u, (i + 1).toLong, tp, from, to, i + 1 == versions.size, n)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == want)
  }
}
