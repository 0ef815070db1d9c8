package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Two-pass exact heavy hitters: the Space-Saving survival guarantee
  * under real eviction pressure (distinct items >> counter budget), the
  * end-to-end top-k parity against a naive recount, and the honesty of
  * the provability flag when the budget is undersized.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Zipf-ish skewed stream: item i appears ~1000/i times, interleaved
    * deterministically so heavy items arrive mixed with the tail. */
  private val skewed: Seq[String] = {
    val raw = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"item$i"))
    // deterministic shuffle: order by a multiplicative hash of position
    raw.zipWithIndex.sortBy { case (_, ix) => ix * 2654435761L % raw.size }
      .map(_._1)
  }

  test("SpaceSaving keeps every item with count > n/m under eviction") {
    val m = 24 // far below the 200 distinct items: eviction binds hard
    val ss = new HeavyHitters.SpaceSaving(m)
    skewed.foreach(ss.add)
    assert(ss.n == skewed.size.toLong)
    val exact = skewed.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val kept = ss.keys.toSet
    val mustKeep = exact.filter(_._2 > skewed.size.toLong / m).keySet
    assert(mustKeep.nonEmpty, "fixture lost its skew")
    assert(mustKeep.subsetOf(kept),
      s"guarantee broken: missing ${mustKeep -- kept}")
  }

  test("topKExact matches a naive recount with eviction binding, flag true") {
    // 64 counters: cnt_10 (=100) > N/64 (~92), so the top-10 is PROVABLY
    // candidate-covered — while 200 distinct items per partition keep
    // eviction binding hard
    val k = 10
    val ds = spark.createDataset(skewed).repartition(8)
    val got = HeavyHitters.topKExact(ds, k, counters = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val want = skewed.groupBy(identity).toSeq
      .map { case (t, xs) => (t, xs.size.toLong) }
      .sortBy { case (t, c) => (-c, t) }.take(k)
    assert(got.map(r => (r._1, r._2)).toSeq == want)
    assert(want.last._2 * 64 > skewed.size.toLong, "fixture drifted unprovable")
    assert(got.forall(_._3))
  }

  test("an undersized budget reports provably_exact = false, never lies") {
    // near-uniform stream over 40 items with 8 counters: cnt_k is ~N/40,
    // far under N/8 — the bound CANNOT certify the result
    val uniform = (0 until 4000).map(i => s"u${i % 40}")
    val ds = spark.createDataset(uniform).repartition(4)
    val got = HeavyHitters.topKExact(ds, 10, counters = 8).collect()
    assert(got.nonEmpty, "empty result would pass the forall vacuously")
    assert(got.forall(!_.getBoolean(2)))
  }

  test("parameter guards reject degenerate configs") {
    val ds = spark.createDataset(Seq("a"))
    intercept[IllegalArgumentException] { HeavyHitters.topKExact(ds, 0, 8) }
    intercept[IllegalArgumentException] { HeavyHitters.topKExact(ds, 1, 0) }
  }

  test("a null item fails loud, not with a TreeSet NPE") {
    val ss = new HeavyHitters.SpaceSaving(4)
    val e = intercept[IllegalArgumentException] { ss.add(null) }
    assert(e.getMessage.contains("null item"))
  }
}
