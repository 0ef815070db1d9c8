package graft.plans

import graft.functions.{Similarity, TextHash, VectorFunctions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point: registers the graft expression
  * family into any session created with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), making
  * `token_set_ratio` / `partial_ratio` / `indel_ratio` /
  * `cosine_sq_scaled` / `minhash_sig` / `simhash64` available to plain
  * SQL — including spark-sql shells and JDBC/Thrift sessions where no
  * Scala code runs.
  *
  * Deliberately NO custom `Rule[LogicalPlan]` or `SparkStrategy` is
  * injected: the survey's conclusion (SURVEY.md §4, §7.3) is that every
  * reference semantic is expressible at the public DataFrame/expression
  * layer, where Catalyst's own optimizer does the planning. The one
  * candidate (the fuzzy join) is handled at the API level by
  * distinct-text scoring + token blocking, which a planner rule could
  * not improve on.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("token_set_ratio"),
      info("token_set_ratio", "token_set_ratio(a, b) - RapidFuzz-style token-set similarity 0..100"),
      (es: Seq[Expression]) => Similarity.TokenSetRatio(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("partial_ratio"),
      info("partial_ratio", "partial_ratio(a, b) - best-window indel similarity 0..100"),
      (es: Seq[Expression]) => Similarity.PartialRatio(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("indel_ratio"),
      info("indel_ratio", "indel_ratio(a, b) - whole-string indel similarity 0..100"),
      (es: Seq[Expression]) => Similarity.IndelRatio(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("cosine_sq_scaled"),
      info("cosine_sq_scaled", "cosine_sq_scaled(qa, qb) - sign-corrected scaled cosine^2 of quantized bigint vectors"),
      (es: Seq[Expression]) => VectorFunctions.CosineSqScaledQ(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 16-bit SimHash of the token set as bigint"),
      (es: Seq[Expression]) => TextHash.Simhash(es.head, 16)))
  }
}
