package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAggregatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("typed top-k aggregator matches the rank-window top-k") {
    val df = Seq(
      (1L, "a", 90.0, "X1"), (1L, "b", 95.0, "X2"), (1L, "c", 80.0, "X3"),
      (1L, "d", 95.0, "X0"), (2L, "e", 70.0, "Y1"))
      .toDF("item_id", "name", "score", "ext_id")
    val topk = TopKAggregator.topK(2)
    val got = df.groupBy("item_id")
      .agg(topk($"name", $"score", $"ext_id").as("alts"))
      .select($"item_id", expr("transform(alts, a -> a.ext_id)").as("ids"))
      .as[(Long, Seq[String])].collect().toMap
    // ties on 95.0 break by ext_id asc: X0 before X2
    assert(got(1L) == Seq("X0", "X2"))
    assert(got(2L) == Seq("Y1"))
  }

  test("bounded buffer: aggregating many rows keeps only k") {
    val big = (1 to 5000).map(i => (1L, s"n$i", (i % 100).toDouble, f"E$i%05d"))
      .toDF("item_id", "name", "score", "ext_id")
    val topk = TopKAggregator.topK(3)
    val alts = big.groupBy("item_id")
      .agg(topk($"name", $"score", $"ext_id").as("alts"))
      .select(size($"alts")).as[Int].head()
    assert(alts == 3)
  }
}
