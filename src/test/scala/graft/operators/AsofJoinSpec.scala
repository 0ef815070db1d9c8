package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** As-of join semantics (backward / forward / nearest): latest
  * at-or-before (resp. earliest at-or-after, closer-of-the-two) match
  * per key, tie inclusion, deterministic right-side dedup, null on
  * no-match — each checked against a naive driver-side recomputation.
  */
class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asofBackward picks the greatest right ts <= left ts per key") {
    val left = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 50L, 12L),
      (2L, 400L, 13L), (3L, 999L, 14L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 100L, 900L), (1L, 200L, 901L), (1L, 300L, 902L),
      (2L, 60L, 903L), (2L, 400L, 904L))
      .toDF("k", "ts", "rid")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("rid"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // lid 10: tie at ts=100 matches (<=); lid 12: right@60 > 50 -> none;
    // lid 13: tie at 400; lid 14: key 3 has no right rows at all
    assert(got.toSeq == Seq((10L, 900L), (11L, 901L), (12L, -1L),
      (13L, 904L), (14L, -1L)))
  }

  test("asofBackward dedups right (key, ts) rows to the greatest payload struct") {
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, 90L, 5L, "a"), (1L, 90L, 9L, "b"), (1L, 90L, 7L, "c"))
      .toDF("k", "ts", "rid", "tag")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "ts",
      Seq("rid", "tag")).collect()
    assert(got.length == 1 && got(0).getLong(2) == 9L && got(0).getString(3) == "b")
  }

  test("asofBackward handles null timestamps like ASOF LEFT JOIN") {
    val left = Seq((1L, Some(100L), 10L), (1L, None, 11L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, None: Option[Long], 900L), (1L, Some(50L), 901L))
      .toDF("k", "ts", "rid")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("rid"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // null-ts right row never matches; null-ts left row kept, unmatched
    assert(got.toSeq == Seq((10L, 901L), (11L, -1L)))
  }

  test("asofBackward maxGap nulls out stale matches, keeps fresh ones") {
    val left = Seq((1L, 100L, 10L), (1L, 200L, 11L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 95L, 900L)).toDF("k", "ts", "rid")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("rid"),
        maxGap = Some(10L))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // lid 10: gap 5 <= 10 matches; lid 11: gap 105 > 10 -> nulled
    assert(got.toSeq == Seq((10L, 900L), (11L, -1L)))
    intercept[IllegalArgumentException] {
      AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("rid"),
        maxGap = Some(-1L))
    }
  }

  test("asofBackward matches a naive recompute on a pseudo-random workload") {
    val left = (1L to 200L).map(i => (i % 7, i * 13 % 500, i)).toDF("k", "ts", "lid")
    val rightRows = (1L to 150L).map(i => (i % 5, i * 29 % 500, 1000L + i))
    val right = rightRows.toDF("k", "ts", "rid")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("rid"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    val want = (1L to 200L).map { i =>
      val (k, ts) = (i % 7, i * 13 % 500)
      val cand = rightRows.filter(r => r._1 == k && r._2 <= ts)
      if (cand.isEmpty) (i, -1L)
      else {
        val best = cand.map(_._2).max
        (i, cand.filter(_._2 == best).map(_._3).max) // greatest rid at tied ts
      }
    }
    assert(got == want)
  }

  test("asofForward picks the smallest right ts >= left ts per key") {
    val left = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 450L, 12L),
      (2L, 30L, 13L), (3L, 999L, 14L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 100L, 900L), (1L, 200L, 901L), (1L, 300L, 902L),
      (2L, 60L, 903L), (2L, 400L, 904L))
      .toDF("k", "ts", "rid")
    val got = AsofJoin.asofForward(left, right, Seq("k"), "ts", Seq("rid"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // lid 10: tie at ts=100 matches (>=); lid 11: next is 300;
    // lid 12: right@400 < 450 -> none; lid 13: next is 60; lid 14: no rows
    assert(got.toSeq == Seq((10L, 900L), (11L, 902L), (12L, -1L),
      (13L, 903L), (14L, -1L)))
  }

  test("asofForward handles null timestamps and maxGap like the backward twin") {
    val left = Seq((1L, Some(100L), 10L), (1L, None, 11L), (1L, Some(10L), 12L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, None: Option[Long], 900L), (1L, Some(150L), 901L))
      .toDF("k", "ts", "rid")
    val got = AsofJoin.asofForward(left, right, Seq("k"), "ts", Seq("rid"),
        maxGap = Some(60L))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // lid 10: gap 50 <= 60 matches; lid 11 (null ts): unmatched;
    // lid 12: gap 140 > 60 -> nulled
    assert(got.toSeq == Seq((10L, 901L), (11L, -1L), (12L, -1L)))
  }

  test("asofNearest picks the closer direction, exact ties to backward") {
    val left = Seq((1L, 100L, 10L), (1L, 205L, 11L), (1L, 296L, 12L),
      (1L, 250L, 13L), (2L, 5L, 14L), (3L, 7L, 15L))
      .toDF("k", "ts", "lid")
    val right = Seq((1L, 200L, 901L), (1L, 300L, 902L), (2L, 90L, 903L))
      .toDF("k", "ts", "rid")
    val got = AsofJoin.asofNearest(left, right, Seq("k"), "ts", Seq("rid"))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
    // lid 10: only forward (200) exists; lid 11: 5 back vs 95 fwd -> back;
    // lid 12: 96 back vs 4 fwd -> fwd; lid 13: 50 back vs 50 fwd ->
    // TIE -> backward; lid 14: only forward; lid 15: no right rows
    assert(got.toSeq == Seq((10L, 901L), (11L, 901L), (12L, 902L),
      (13L, 901L), (14L, 903L), (15L, -1L)))
  }

  test("asofForward and asofNearest match naive recomputes on a pseudo-random workload") {
    val gap = 37L
    val leftRows = (1L to 200L).map(i => (i % 7, i * 13 % 500, i))
    val rightRows = (1L to 150L).map(i => (i % 5, i * 29 % 500, 1000L + i))
    val left = leftRows.toDF("k", "ts", "lid")
    val right = rightRows.toDF("k", "ts", "rid")
    // naive per-direction candidate: (ts, rid-of-greatest-payload) or None
    def back(k: Long, ts: Long) = {
      val c = rightRows.filter(r => r._1 == k && r._2 <= ts)
      if (c.isEmpty) None
      else { val b = c.map(_._2).max; Some((b, c.filter(_._2 == b).map(_._3).max)) }
    }
    def fwd(k: Long, ts: Long) = {
      val c = rightRows.filter(r => r._1 == k && r._2 >= ts)
      if (c.isEmpty) None
      else { val b = c.map(_._2).min; Some((b, c.filter(_._2 == b).map(_._3).max)) }
    }
    val gotF = AsofJoin.asofForward(left, right, Seq("k"), "ts", Seq("rid"),
        maxGap = Some(gap))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    val wantF = leftRows.map { case (k, ts, i) =>
      (i, fwd(k, ts).filter(_._1 - ts <= gap).map(_._2).getOrElse(-1L))
    }
    assert(gotF == wantF, "forward drift")
    val gotN = AsofJoin.asofNearest(left, right, Seq("k"), "ts", Seq("rid"),
        maxGap = Some(gap))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    val wantN = leftRows.map { case (k, ts, i) =>
      val b = back(k, ts).filter(ts - _._1 <= gap)
      val f = fwd(k, ts).filter(_._1 - ts <= gap)
      val pick = (b, f) match {
        case (Some((bts, bid)), Some((fts, _))) if ts - bts <= fts - ts => bid
        case (_, Some((_, fid))) => fid
        case (Some((_, bid)), None) => bid
        case _ => -1L
      }
      (i, pick)
    }
    assert(gotN == wantN, "nearest drift")
  }

  test("asofBackward maxGap matches a naive recompute on the same workload") {
    val gap = 37L
    val left = (1L to 200L).map(i => (i % 7, i * 13 % 500, i)).toDF("k", "ts", "lid")
    val rightRows = (1L to 150L).map(i => (i % 5, i * 29 % 500, 1000L + i))
    val right = rightRows.toDF("k", "ts", "rid")
    val got = AsofJoin.asofBackward(left, right, Seq("k"), "ts", Seq("rid"),
        maxGap = Some(gap))
      .orderBy("lid").collect()
      .map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    val want = (1L to 200L).map { i =>
      val (k, ts) = (i % 7, i * 13 % 500)
      // the backward match is unchanged; the gap gate only nulls it
      val cand = rightRows.filter(r => r._1 == k && r._2 <= ts)
      if (cand.isEmpty) (i, -1L)
      else {
        val best = cand.map(_._2).max
        if (ts - best > gap) (i, -1L)
        else (i, cand.filter(_._2 == best).map(_._3).max)
      }
    }
    assert(got == want)
  }
}
