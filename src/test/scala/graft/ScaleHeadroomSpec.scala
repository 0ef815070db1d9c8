package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Headroom smoke: the aggregation/join kernels must hold their
  * linear-scaling invariants when the input multiplies — counts and
  * integer sums scale exactly by the replication factor, join
  * multiplicity stays key-driven. (Replication only widens the data;
  * the per-key distributions the plans shuffle on are unchanged, which
  * is precisely the claim "this plan survives a scale-up".)
  */
class ScaleHeadroomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"
  private val factor = 16

  private def widen(df: org.apache.spark.sql.DataFrame) =
    (1 to factor).map(_ => df).reduce(_ union _)

  test(s"rollup invariants hold at ${factor}x replication") {
    val li = Tables(spark, dir, "lineitem")
    val wide = widen(li)
      .repartition(spark.sparkContext.defaultParallelism * 4)
    val one = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val big = wide.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("cents"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(big.keySet == one.keySet)
    one.foreach { case (k, (n, cents)) =>
      assert(big(k) == (n * factor, cents * factor), s"flag $k broke linearity")
    }
  }

  test("star-capped candidate pairs grow LINEARLY in degenerate buckets") {
    import spark.implicits._
    def pairs(bucketSize: Int): Long = {
      val rows = (0 until bucketSize).map(i => ("hot", i.toLong)) ++
        Seq(("cold", 1000L), ("cold", 1001L))
      graft.operators.Dedup.cappedBucketPairs(
        rows.toDF("bucket", "id"), Seq("bucket"), "id", maxBucket = 8).count()
    }
    // over the cap the bucket contributes B-1 star pairs — doubling the
    // degenerate bucket doubles the output instead of quadrupling it
    assert(pairs(64) == 63 + 1)
    assert(pairs(128) == 127 + 1)
    // at the cap the full clique survives
    assert(pairs(8) == 8 * 7 / 2 + 1)
  }

  test(s"broadcast join multiplicity stays key-driven at ${factor}x") {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    val wide = widen(li)
    val n1 = li.join(broadcast(p), li("l_partkey") === p("p_partkey")).count()
    val nN = wide.join(broadcast(p), wide("l_partkey") === p("p_partkey")).count()
    assert(nN == n1 * factor)
  }
}
