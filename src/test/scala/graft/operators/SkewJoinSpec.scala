package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val li = graft.Tables(spark, SparkTestSession.sfDir, "lineitem")
    val p = graft.Tables(spark, SparkTestSession.sfDir, "part")
      .select($"p_partkey".as("l_partkey"), $"p_brand")
    val plain = li.join(p, Seq("l_partkey"))
      .groupBy("p_brand").count().orderBy("p_brand").collect()
    val salted = SkewJoin.saltedJoin(li, p, Seq("l_partkey"), $"l_orderkey", 4)
      .groupBy("p_brand").count().orderBy("p_brand").collect()
    assert(plain.map(_.toString).toSeq == salted.map(_.toString).toSeq)
  }

  test("two-phase aggregation equals direct aggregation") {
    val li = graft.Tables(spark, SparkTestSession.sfDir, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").cast("long").as("q"))
      .orderBy("l_returnflag").collect()
    val twoPhase = SkewJoin.twoPhaseAgg(
      li, Seq("l_returnflag"), $"l_orderkey", 8)(
      Seq(count(lit(1)).as("pn"), sum($"l_quantity").as("pq")),
      Seq(sum($"pn").as("n"), sum($"pq").cast("long").as("q")))
      .orderBy("l_returnflag").collect()
    assert(direct.map(_.toString).toSeq == twoPhase.map(_.toString).toSeq)
  }
}
