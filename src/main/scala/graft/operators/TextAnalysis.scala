package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document-level text analysis: token counting, quality scoring,
  * language ID, fingerprinting — one narrow projection per document,
  * fully codegen'd (no UDFs), so the scan stays the only cost at scale.
  */
object TextAnalysis {

  /** Marker lists for the language-ID heuristic. For real corpora these
    * are per-language stopword n-gram tables (broadcast-sized); the
    * mechanism (token-hit argmax) is the operator. */
  val DefaultMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")

  /** Full per-document analysis projection. */
  def analyze(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    df.withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))
      .withColumn("n_subwords", TextFunctions.subwordCount(col(textCol)))
      .withColumn("quality_mills", TextFunctions.qualityScoreMills(col(textCol)))
      .withColumn("stopword_hits",
        TextFunctions.stopwordHits(toks, DefaultStopwords).cast("long"))
      .withColumn("lang_pred", TextFunctions.langIdHeuristic(toks, DefaultMarkers))
      .withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))
  }
}
