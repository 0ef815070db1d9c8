package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions.col
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

  test("trailingZFlags: planted spike flags, flat series and cold start never") {
    // key A: days 1..7 flat at 10, day 8 spikes to 30. Baseline for
    // day 8 = days 1..7 (m=7, s=70, q=700): dev = 7·30−70 = 140,
    // lhs = 140²·10⁶ = 1.96e10; var term m·q−s² = 4900−4900 = 0 → any
    // spike over a ZERO-variance baseline flags at any z. Days 2..7
    // have dev = 0 → never flag. Day 1 has an empty window (cold).
    val a = (1L to 7L).map(d => ("A", d, 10L)) :+ (("A", 8L, 30L))
    // key B: alternating 9/11 (variance > 0), all points within 2σ
    val b = (1L to 8L).map(d => ("B", d, if (d % 2 == 0) 11L else 9L))
    val df = (a ++ b).toDF("k", "tick", "v")
    val r = Rolling.trailingZFlags(df, "k", "tick", "v",
        lookback = 7L, minPoints = 4, zMills = 2000L)
      .collect().map(x => (x.getAs[String]("k"), x.getAs[Long]("tick")) ->
        ((x.getAs[Long]("win_n"), x.getAs[Long]("win_sum"),
          x.getAs[Boolean]("anomalous")))).toMap
    assert(r(("A", 8L)) == ((7L, 70L, true)))
    // cold start: < minPoints baseline rows, never flagged
    (1L to 4L).foreach(d => assert(!r(("A", d))._3, s"day $d cold-start"))
    assert(r(("A", 1L))._1 == 0L && r(("A", 1L))._2 == 0L)
    // flat continuation: zero deviation
    (5L to 7L).foreach(d => assert(!r(("A", d))._3))
    // alternating series: dev = m·x − s stays inside 2σ
    (1L to 8L).foreach(d => assert(!r(("B", d))._3, s"B day $d"))
    // the current row is EXCLUDED from its own baseline: the spike's
    // window sum is the seven 10s, not 70 + 30
    assert(r(("A", 8L))._2 == 70L)
  }

  test("trailingZFlags: exact 2-sigma boundary does NOT flag (strict >)") {
    // baseline 0,20,0,20 → m=4, s=40, q=800: μ=10, population
    // σ² = (m·q − s²)/m² = 1600/16 = 100, σ=10, so the 2σ boundary is
    // x = 30 exactly. Integer form: rhs = 2000²·1600 = 6.4e9; at
    // x = 30: dev = 4·30−40 = 80, lhs = 80²·10⁶ = 6.4e9 = rhs → the
    // strict > must NOT flag; x = 31 (dev 84, lhs 7.056e9) must.
    val base = Seq(("K", 1L, 0L), ("K", 2L, 20L), ("K", 3L, 0L), ("K", 4L, 20L))
    def flag(x: Long): Boolean =
      Rolling.trailingZFlags((base :+ (("K", 5L, x))).toDF("k", "tick", "v"),
          "k", "tick", "v", lookback = 7L, minPoints = 4, zMills = 2000L)
        .where(col("tick") === 5L).head().getAs[Boolean]("anomalous")
    assert(!flag(30L), "dev exactly z·σ must not flag (strict >)")
    assert(flag(31L))
    assert(!flag(20L))
    assert(flag(-11L), "the two-sided |x − μ| test must flag low outliers")
    assert(!flag(-10L))
  }
}
