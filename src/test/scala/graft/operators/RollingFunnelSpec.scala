package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Rolling.trailingAgg (RANGE-frame trailing features) and
  * Funnel.funnel (ordered sequential-conversion funnel): semantics vs
  * naive driver-side recomputations, tie/peer handling, strict-after
  * step ordering, and the one-exchange plan contract for multi-span
  * windows.
  */
class RollingFunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("trailingAgg matches the naive [ts-span, ts] recomputation") {
    val rows = Seq(
      (1L, 0L, 5L), (1L, 50L, 7L), (1L, 100L, 1L), (1L, 101L, 2L),
      (1L, 300L, 4L), (2L, 10L, 9L), (2L, 10L, 3L), (2L, 500L, 6L))
    val df = rows.toDF("k", "ts", "v")
    val got = Rolling.trailingAgg(df, "k", "ts", "v", Seq("w" -> 100L))
      .select("k", "ts", "v", "n_w", "sum_w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val want = rows.map { case (k, ts, v) =>
      val frame = rows.filter { case (k2, ts2, _) =>
        k2 == k && ts2 >= ts - 100L && ts2 <= ts }
      (k, ts, v, frame.size.toLong, frame.map(_._3).sum)
    }.toSet
    // exact-timestamp peers (k=2, ts=10) must each see the whole tie
    // group: RANGE, not ROWS
    assert(want.exists { case (k, ts, _, n, s) => k == 2 && ts == 10 && n == 2 && s == 12 })
    assert(got == want)
  }

  test("multiple spans share one exchange and one sort") {
    val df = Seq((1L, 10L, 1L), (2L, 20L, 2L)).toDF("k", "ts", "v")
    val out = Rolling.trailingAgg(df, "k", "ts", "v",
      Seq("a" -> 10L, "b" -> 100L, "c" -> 1000L))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    val sorts = "\\bSort\\b".r.findAllIn(plan).size
    assert(exchanges == 1, s"each span must not add an exchange:\n$plan")
    assert(sorts == 1, s"each span must not add a sort:\n$plan")
  }

  test("funnel enforces strictly-after step ordering") {
    // user 1 converts fully; user 2's purchase PRECEDES its click (no
    // stage 3); user 3 only signs up; user 4 never signs up (absent);
    // user 5's click is simultaneous with signup (strict > excludes it)
    val ev = Seq(
      (1L, 10L, "signup"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "signup"), (2L, 40L, "click"), (2L, 30L, "purchase"),
      (3L, 10L, "signup"),
      (4L, 10L, "click"), (4L, 20L, "purchase"),
      (5L, 10L, "signup"), (5L, 10L, "click"), (5L, 25L, "purchase"))
      .toDF("u", "ts", "t")
    val got = Funnel.funnel(ev, "u", "ts", "t",
        Seq("signup", "click", "purchase"))
      .orderBy("u")
      .collect()
      .map(r => (r.getLong(0), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 3L), (2L, 2L), (3L, 1L), (5L, 1L)))
  }

  test("PROPERTY: funnel matches a naive sequential-min fold on random logs") {
    val steps = Seq("signup", "click", "purchase")
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val evs = Seq.fill(80)((rnd.nextInt(5).toLong + 1,
        rnd.nextInt(200).toLong,
        Seq("signup", "click", "purchase", "view")(rnd.nextInt(4))))
      val want = evs.groupBy(_._1).flatMap { case (u, es) =>
        def nextMin(after: Option[Long], step: String): Option[Long] =
          after.flatMap(a =>
            es.filter(e => e._3 == step && e._2 > a).map(_._2).minOption)
        val t1 = es.filter(_._3 == steps.head).map(_._2).minOption
        val t2 = nextMin(t1, steps(1))
        val t3 = nextMin(t2, steps(2))
        t1.map(_ => u -> ((t1, t2, t3,
          Seq(t1, t2, t3).count(_.isDefined).toLong)))
      }
      val got = Funnel.funnel(evs.toDF("u", "ts", "t"), "u", "ts", "t", steps)
        .collect().map { r =>
          def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
          r.getLong(0) -> ((opt(1), opt(2), opt(3), r.getLong(4)))
        }.toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("funnel step times are the earliest qualifying events") {
    val ev = Seq(
      (1L, 10L, "signup"), (1L, 5L, "signup"), (1L, 7L, "click"),
      (1L, 20L, "click"), (1L, 15L, "click"), (1L, 100L, "purchase"))
      .toDF("u", "ts", "t")
    val r = Funnel.funnel(ev, "u", "ts", "t",
      Seq("signup", "click", "purchase")).collect().head
    // t1 = min signup = 5; t2 = min click AFTER 5 = 7 (not 15/20);
    // t3 = min purchase after 7 = 100
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((5L, 7L, 100L, 3L)))
  }
}
