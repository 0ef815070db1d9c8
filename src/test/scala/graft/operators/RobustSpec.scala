package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobustSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("winsorize clips at the exact rank-ceil percentile bounds per stratum") {
    // stratum a: 1..20 plus extremes 0 and 100 (n = 22):
    //   lo = rank ceil(22/20) = 2nd smallest = 1
    //   hi = rank ceil(22·19/20) = 21st = 20
    // stratum b: constant 5s — lo = hi = 5, nothing flagged
    val a = (Seq(0L, 100L) ++ (1L to 20L)).map(v => ("a", v))
    val b = Seq.fill(4)(("b", 5L))
    val df = (a ++ b).zipWithIndex
      .map { case ((s, v), i) => (i.toLong, s, v) }
      .toDF("id", "strat", "v")
    val out = Robust.winsorize(df, "strat", "v", 1, 20, 19, 20)
      .select("id", "strat", "v", "lo", "hi", "clipped", "is_outlier")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5),
        r.getBoolean(6)))).toMap
    assert(out.size == 26)
    val aRows = df.where($"strat" === "a").select("id", "v")
      .as[(Long, Long)].collect().toMap
    aRows.foreach { case (id, v) =>
      val (lo, hi, clipped, flag) = out(id)
      assert(lo == 1L && hi == 20L, s"bounds for a: $lo/$hi")
      assert(clipped == math.min(math.max(v, 1L), 20L))
      assert(flag == (v < 1L || v > 20L))
    }
    val bIds = df.where($"strat" === "b").select("id").as[Long].collect()
    bIds.foreach { id =>
      assert(out(id) == ((5L, 5L, 5L, false)))
    }
    intercept[IllegalArgumentException] {
      Robust.winsorize(df, "strat", "v", 19, 20, 1, 20) // inverted band
    }
    intercept[IllegalArgumentException] {
      Robust.winsorize(df.withColumnRenamed("v", "lo"), "strat", "lo", 1, 2, 1, 2)
    }
  }

  test("winsorize passes null values through unclipped and unflagged") {
    val df = Seq(("a", Some(1L)), ("a", Some(2L)), ("a", Some(3L)),
      ("a", None)).toDF("strat", "v")
    val out = Robust.winsorize(df, "strat", "v", 0, 1, 1, 1)
      .where($"v".isNull).select("clipped", "is_outlier").collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(0) && !out.head.getBoolean(1))
  }


  test("winsorize: a NULL stratum is a legal bin and receives its bounds") {
    val df = Seq((Option.empty[String], 1L), (None, 2L), (None, 3L),
      (None, 4L), (Some("en"), 10L)).toDF("strat", "v")
    val out = Robust.winsorize(df, "strat", "v", 1, 4, 3, 4)
      .where($"strat".isNull)
      .select("v", "lo", "hi", "clipped", "is_outlier")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    // n = 4: lo = rank ceil(4/4) = 1, hi = rank ceil(12/4) = 3; a plain
    // equi-join would leave lo/hi NULL and pass 4 through unflagged
    assert(out.map(_._2).forall(_ == 1L) && out.map(_._3).forall(_ == 3L))
    assert(out.map(r => r._1 -> r._4).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L))
    assert(out.count(_._5) == 1 && out.find(_._5).get._1 == 4L)
  }
}
