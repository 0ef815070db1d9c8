package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable plan contracts: the physical plans the scale design
  * promises (COVERAGE.md) — column pruning at the scan, broadcast for
  * small dimensions, partial top-k before the rank shuffle, no
  * cross-product anywhere in the oracle-checked inventory.
  */
class PlanAssertionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q01: scan prunes to the 6 referenced lineitem columns") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_shipdate"), "unreferenced column not pruned")
    assert(p.contains("l_returnflag"))
  }

  test("q06: dimension join is a broadcast hash join") {
    val p = plan("q06_rev_by_brand")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q09: multiway join broadcasts both small dims") {
    val p = plan("q09_multiway_rollup")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
  }

  test("q10: rank window applies partial top-k before the shuffle") {
    val p = plan("q10_top3_per_customer")
    assert(p.contains("WindowGroupLimit"), "expected rank-limit pushdown")
  }

  test("q37: only the query set is broadcast; corpus is never shuffled for scoring") {
    val p = plan("q37_knn_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("WindowGroupLimit"))
  }

  test("no oracle query plans a CartesianProduct") {
    SparkEntry.oracleSql.keySet.toSeq.sorted.foreach { q =>
      assert(!plan(q).contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("q18: the max-anchored window filter broadcasts the 1-row aggregate") {
    val p = plan("q18_last24h_by_type")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }
}
