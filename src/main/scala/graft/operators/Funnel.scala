package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential-conversion funnel over an event stream: for an ordered
  * list of step types (e.g. signup → click → purchase), compute per
  * entity the earliest time each step was reached, where step i only
  * counts STRICTLY AFTER the entity's step i-1 time (the standard
  * ordered-funnel semantics — re-orderings don't convert). Generalizes
  * the reference's per-day usage accounting (`app/logging_utils.py`)
  * to multi-stage conversion analysis.
  *
  * Algorithm: iterated earliest-qualifying-event aggregation.
  * `t1 = min ts over events of type steps(0)`;
  * `t_{i+1} = min ts over events of type steps(i) with ts > t_i`.
  * Each iteration is one filtered scan of the events frame joined to
  * the current per-entity frame on the key, then a min-aggregation —
  * a hash-agg shuffle bounded by |entities|, never a window over the
  * raw stream.
  *
  * Scale shape: the per-entity accumulator is one row per entity that
  * reached step 1 — typically orders of magnitude smaller than the
  * stream but NOT bounded like a dimension table, so the join is left
  * un-hinted: AQE broadcasts it when it fits and falls back to a
  * shuffle join when it doesn't (1e9-user stores). The type filter
  * prunes each scan before the join, and steps are few (a funnel is
  * 3-6 stages), so the pass count is a small constant.
  */
object Funnel {

  /** Per-entity funnel frame: `keyCol, t1 .. tN` (epoch long of each
    * reached step, null once a step is missed) plus `stage` = number
    * of steps reached. Entities that never fired steps.head are absent
    * (stage-0 rows carry no information).
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    val first = events.where(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t1"))
    val full = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t$i"; val cur = s"t${i + 1}"
        val reached = events.where(col(typeCol) === step)
          .select(col(keyCol), col(tsCol))
          .join(acc.select(col(keyCol), col(prev)), Seq(keyCol))
          .where(col(tsCol) > col(prev))
          .groupBy(col(keyCol)).agg(min(col(tsCol)).as(cur))
        acc.join(reached, Seq(keyCol), "left")
    }
    val stage = steps.indices
      .map(i => when(col(s"t${i + 1}").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    full.withColumn("stage", stage)
  }
}
