package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver's t1 smoke + rows>0 checks: every declared query
  * runs and returns rows on sf0.001, and every oracle key exists. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, SparkTestSession.sfDir).count() > 0, s"$name returned 0 rows")
    }
  }
}
