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

  /** Repetition-filter thresholds (Gopher-style; shared with q65's
    * oracle SQL — edit HERE). Docs whose single most frequent word
    * bigram covers ≥ 20% of all bigrams, or whose repeated trigrams
    * cover ≥ 30% of all trigrams, fail the filter. */
  val MaxTopBigramShareMills: Long = 200L
  val MaxDupTrigramMills: Long = 300L

  /** Gopher/C4-style repetition quality signals per document (the
    * standard pretraining-data repetition filters, word-level): the
    * most-frequent-bigram share and the repeated-trigram mass, in
    * mills, plus the combined pass flag. Only docs with ≥ 3 tokens
    * (a non-empty trigram set) are scored. Shape: one explode of the
    * order-tagged n-gram union through a single counting shuffle and a
    * per-doc conditional rollup — work linear in corpus token count. */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = df.where(col(textCol).isNotNull)
      .select(col(idCol),
        TextFunctions.wordNGrams(col(textCol), 2).as("bi"),
        TextFunctions.wordNGrams(col(textCol), 3).as("tri"))
      .where(size(col("tri")) > 0)
    // ONE explode of the order-tagged n-gram union -> one (id, n, gram)
    // counting shuffle -> one per-doc rollup. Conditional aggregates
    // split the orders back out; no second shuffle tree, no join.
    val tagged = base.select(col(idCol), explode(concat(
        transform(col("bi"), g => struct(lit(2).as("n"), g.as("g"))),
        transform(col("tri"), g => struct(lit(3).as("n"), g.as("g"))))).as("t"))
      .select(col(idCol), col("t.n").as("n"), col("t.g").as("g"))
    tagged.groupBy(col(idCol), col("n"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        floor(lit(1000) * max(when(col("n") === 2, col("c")))
          / sum(when(col("n") === 2, col("c")))).cast("long")
          .as("top_bigram_share_mills"),
        floor(lit(1000) * sum(when(col("n") === 3 && col("c") > 1, col("c")).otherwise(0L))
          / sum(when(col("n") === 3, col("c")))).cast("long")
          .as("dup_trigram_mills"))
      .withColumn("repetition_ok",
        col("top_bigram_share_mills") < MaxTopBigramShareMills &&
          col("dup_trigram_mills") < MaxDupTrigramMills)
  }

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
