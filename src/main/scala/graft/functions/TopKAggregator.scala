package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §2.10): the order-sensitive
  * alternative to `collect_list`-after-window for the reference's top-3
  * alternatives (`app/etl.py:1344-1351`). The buffer is a bounded sorted
  * list (size ≤ k), so partial aggregation keeps map-side state O(k)
  * per group regardless of group size — the scale argument for a UDAF
  * over a rank window when only the top few rows per key are needed and
  * the per-key cardinality is huge.
  *
  * Ordering is (score desc, ext_id asc) — fully deterministic, matching
  * the rank-window tiebreak used everywhere else.
  */
object TopKAggregator {

  case class Scored(name: String, score: Double, ext_id: String)

  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def ord(s: Scored): (Double, String) = (-s.score, s.ext_id)

    override def zero: Seq[Scored] = Seq.empty

    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
      merge(buf, Seq(a))

    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      (b1 ++ b2).sortBy(ord).take(k)

    override def finish(reduction: Seq[Scored]): Seq[Scored] = reduction

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

    override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
  }

  /** DataFrame-facing column function: `top_k(struct(name,score,ext_id))`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopK(k), Encoders.product[Scored])
}
