package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Count-Min sketch: bit-for-bit parity of buckets and estimates
  * against a driver-side recompute of the md5 hash contract, the
  * structural overcount guarantee, sketch additivity (the 100 TB merge
  * story), and the degenerate-geometry edges.
  */
class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Depth = 4
  private val Width = 64

  /** The hash contract, recomputed independently of Spark. */
  private def refBucket(item: String, row: Int, width: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"$item#cms$row".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % width
  }

  private def refEstimate(corpus: Seq[String], probe: String,
                          depth: Int, width: Int): Long =
    (0 until depth).map { r =>
      val b = refBucket(probe, r, width)
      corpus.count(t => refBucket(t, r, width) == b).toLong
    }.min

  private val corpus: Seq[String] =
    (1 to 50).flatMap(i => Seq.fill(100 / i)(s"w$i"))

  test("estimates match a driver-side recompute bit-for-bit") {
    val items = spark.createDataset(corpus).toDF("tok").repartition(8)
    val sk = CountMin.sketch(items, "tok", Depth, Width)
    val probes = corpus.distinct.sorted.toDF("tok")
    val got = CountMin.estimate(sk, probes, "tok", Depth, Width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == corpus.distinct.size)
    corpus.distinct.foreach { t =>
      assert(got(t) == refEstimate(corpus, t, Depth, Width),
        s"estimate drift for $t")
    }
  }

  test("estimate >= true count for every item, always") {
    val items = spark.createDataset(corpus).toDF("tok")
    val sk = CountMin.sketch(items, "tok", Depth, Width)
    val exact = corpus.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val got = CountMin.estimate(sk, exact.keys.toSeq.toDF("tok"), "tok", Depth, Width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) => assert(got(t) >= c, s"undercount for $t") }
  }

  test("sketches are additive: union's sketch == summed slice sketches") {
    val (a, b) = corpus.splitAt(corpus.size / 3)
    def skOf(xs: Seq[String]) =
      CountMin.sketch(spark.createDataset(xs).toDF("tok"), "tok", Depth, Width)
    val merged = skOf(a).unionByName(skOf(b))
      .groupBy("row", "bucket").agg(org.apache.spark.sql.functions.sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = skOf(corpus)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }

  test("width 1 collapses every estimate to N; unseen probes included") {
    val items = spark.createDataset(corpus).toDF("tok")
    val sk = CountMin.sketch(items, "tok", Depth, 1)
    val got = CountMin.estimate(sk, Seq("w1", "never-seen").toDF("tok"), "tok", Depth, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("w1") == corpus.size.toLong)
    assert(got("never-seen") == corpus.size.toLong)
  }

  test("estimate is row-preserving: duplicate probe rows each get a row") {
    val items = spark.createDataset(corpus).toDF("tok")
    val sk = CountMin.sketch(items, "tok", Depth, Width)
    val probes = Seq("w1", "w1", "w2").toDF("tok")
    val got = CountMin.estimate(sk, probes, "tok", Depth, Width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sorted
    assert(got.size == 3)
    assert(got.count(_._1 == "w1") == 2)
    assert(got.filter(_._1 == "w1").map(_._2).distinct.size == 1)
  }

  /** Driver-side twin of CountMin.epsBound: ceil((EpsNum/EpsDen/w)·n)
    * in exact BigInt arithmetic. */
  private def refEpsBound(n: Long, width: Int): Long = {
    val den = BigInt(CountMin.EpsDen) * width
    ((BigInt(CountMin.EpsNum) * n + den - 1) / den).toLong
  }

  test("epsBound is exact integer ceil of (e/width)·N, even past 2^53") {
    val ns = Seq(0L, 1L, 63L, 64L, 382L, 1L << 40, (1L << 60) + 7L)
    val got = spark.createDataset(ns).toDF("n")
      .select(CountMin.epsBound("n", Width).as("b"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == ns.map(refEpsBound(_, Width)))
  }

  test("correct geometry honors the eps bound for every probe") {
    val n = corpus.size.toLong
    val bound = refEpsBound(n, Width)
    val items = spark.createDataset(corpus).toDF("tok")
    val sk = CountMin.sketch(items, "tok", Depth, Width)
    val exact = corpus.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val got = CountMin.estimate(sk, exact.keys.toSeq.toDF("tok"), "tok", Depth, Width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) =>
      assert(got(t) <= c + bound, s"eps violation for $t: est=${got(t)} cnt=$c bound=$bound")
    }
  }

  test("a deliberately undersized sketch fails the pinned-geometry gate loudly") {
    // the q84 regression this gate exists for: someone shrinks the
    // sketch (or build/probe geometry drifts) while the gate's bound
    // stays pinned at the production width — within_eps must flip FALSE
    val shrunkWidth = 4
    val n = corpus.size.toLong
    val pinnedBound = refEpsBound(n, Width) // bound at the ORIGINAL width
    val items = spark.createDataset(corpus).toDF("tok")
    val sk = CountMin.sketch(items, "tok", Depth, shrunkWidth)
    val exact = corpus.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val got = CountMin.estimate(sk, exact.keys.toSeq.toDF("tok"), "tok", Depth, shrunkWidth)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val violations = exact.count { case (t, c) => got(t) > c + pinnedBound }
    assert(violations > 0,
      s"shrunk width $shrunkWidth produced no estimate past cnt + $pinnedBound — gate is vacuous")
  }

  test("guards: geometry, reserved probe columns, missing item column") {
    val items = Seq("a").toDF("tok")
    val sk = CountMin.sketch(items, "tok", Depth, Width)
    intercept[IllegalArgumentException] { CountMin.sketch(items, "tok", 0, 8) }
    intercept[IllegalArgumentException] { CountMin.sketch(items, "tok", 2, 0) }
    intercept[IllegalArgumentException] {
      CountMin.estimate(sk, Seq(("a", 1L)).toDF("tok", "bucket"), "tok", Depth, Width)
    }
    intercept[IllegalArgumentException] {
      CountMin.estimate(sk, Seq(("a", 1L)).toDF("tok", "__cms_cnt"), "tok", Depth, Width)
    }
    intercept[IllegalArgumentException] {
      CountMin.estimate(sk, Seq("a").toDF("other"), "tok", Depth, Width)
    }
  }

  test("joinSizeEstimate >= exact inner product; exact at ample width") {
    val a = corpus
    val b = (10 to 60).flatMap(i => Seq.fill(120 / i)(s"w$i"))
    val exact = a.groupBy(identity).map { case (t, xs) =>
      xs.size.toLong * b.count(_ == t) }.sum
    val skA = CountMin.sketch(a.toDF("tok"), "tok", Depth, Width)
    val skB = CountMin.sketch(b.toDF("tok"), "tok", Depth, Width)
    val est = CountMin.joinSizeEstimate(skA, skB, Depth)
      .head().getAs[Long]("est_join")
    assert(est >= exact, s"inner product must never under-estimate")
    // width 4096 >> 80 distinct tokens: with 4 independent rows a
    // colliding pair in EVERY row is vanishingly unlikely — and this
    // is a fixed fixture, so the equality is deterministic once green
    val wide = 4096
    val estWide = CountMin.joinSizeEstimate(
      CountMin.sketch(a.toDF("tok"), "tok", Depth, wide),
      CountMin.sketch(b.toDF("tok"), "tok", Depth, wide), Depth)
      .head().getAs[Long]("est_join")
    assert(estWide == exact, s"ample width: $estWide != $exact")
  }

  test("joinSizeEstimate densifies: disjoint streams at width 1 row-collide") {
    // disjoint vocabularies: exact join size 0; at width 1 every row
    // collides into bucket 0, so the estimate is Na*Nb — the measured
    // worst case — while a HONEST zero appears at ample width
    val a = Seq("x1", "x2", "x3").toDF("tok")
    val b = Seq("y1", "y2").toDF("tok")
    val est1 = CountMin.joinSizeEstimate(
      CountMin.sketch(a, "tok", Depth, 1),
      CountMin.sketch(b, "tok", Depth, 1), Depth)
      .head().getAs[Long]("est_join")
    assert(est1 == 6L, s"width-1 inner product must be Na*Nb, got $est1")
    val estW = CountMin.joinSizeEstimate(
      CountMin.sketch(a, "tok", Depth, Width),
      CountMin.sketch(b, "tok", Depth, Width), Depth)
      .head().getAs[Long]("est_join")
    // densification: if any row shares no bucket the min must see 0;
    // and the estimate can never go below the true 0 anyway
    assert(estW >= 0L && estW <= 6L)
  }
}
