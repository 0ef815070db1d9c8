package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical (keyword) retrieval over a document corpus — the BM25
  * complement to the embedding ANN family (q37/q42/q52): score
  * documents against multi-term keyword queries, keep the top `k` per
  * query.
  *
  * Scoring is the BM25 term-frequency saturation curve with a RATIONAL
  * idf, `(N - df + 0.5) / (df + 0.5)`, i.e. without the usual log
  * wrap: `ln` is the one op in classic BM25 that is NOT bit-portable
  * across engines (libm implementations differ in the last ulps, and a
  * last-ulp flip moves a floored mills value at bin boundaries), while
  * IEEE `+ * /` on integer-derived operands are correctly rounded and
  * engine-identical. Per-term contributions are floored to integer
  * mills and integer-summed (order-free), so scores and ranks are
  * bit-identical on any engine — the same determinism discipline as
  * the quantized cosine kernels. The rational idf preserves the
  * more-common-term-weighs-less ordering per term; it is a documented
  * scoring VARIANT, not a drop-in for classic BM25 scores.
  *
  * Scale shape: documents explode to postings once and are immediately
  * semi-joined (broadcast) against the query vocabulary, so the tf
  * counting shuffle carries only postings of queried terms — work is
  * proportional to the matched postings, never corpus x vocabulary.
  * Document frequencies (one row per queried term), corpus stats (ONE
  * row), and the query-term list all broadcast; ranking is a per-query
  * row_number window that the planner executes as a partial top-k
  * (WindowGroupLimit), never a global sort.
  */
object Retrieval {

  /** Top-k BM25 (rational-idf) matches per query.
    *
    * @param docs    corpus with `idCol` (unique) and `textCol`
    * @param queries query set with `qidCol` (unique) and `qTextCol`
    *                (whitespace-separated keywords); assumed
    *                broadcast-small (a query workload, not a corpus)
    * @return (qidCol, rank, idCol, score_mills), rank 1..k per query in
    *         (score desc, doc id asc) order; queries whose terms all
    *         miss the corpus produce no rows
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, qidCol: String, qTextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(k1 >= 0 && b >= 0 && b <= 1, s"k1=$k1 must be >= 0, b=$b in [0,1]")
    val base = docs.select(col(idCol).as("__doc"),
      TextFunctions.tokens(col(textCol)).as("__toks"),
      TextFunctions.tokenCount(col(textCol)).as("__dl"))
    // corpus stats: ONE row, broadcast; avgdl is one IEEE int/int divide
    val stats = base.agg(count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val qTerms = queries.select(col(qidCol).as("__qid"),
      explode(array_distinct(TextFunctions.tokens(col(qTextCol)))).as("__term"))
    val termSet = qTerms.select("__term").distinct()
    // postings restricted to the query vocabulary BEFORE the tf shuffle
    val postings = base
      .select(col("__doc"), col("__dl"), explode(col("__toks")).as("__term"))
      .join(broadcast(termSet), "__term")
      .groupBy(col("__term"), col("__doc"), col("__dl"))
      .agg(count(lit(1)).as("__tf"))
    // postings are unique per (term, doc): plain count IS the doc freq
    val dfreq = postings.groupBy("__term").agg(count(lit(1)).as("__df"))
    // operand order below is FROZEN (left-assoc, parens as written) —
    // the DuckDB oracle spells the identical sequence; IEEE ops are
    // correctly rounded, so same order => same bits => same floor
    val contrib = postings
      .join(broadcast(dfreq), "__term")
      .join(broadcast(qTerms), "__term")
      .crossJoin(broadcast(stats))
      .select(col("__qid"), col("__doc"),
        floor(
          lit(1000.0) *
            ((col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5))) *
            (col("__tf") * lit(k1 + 1.0)) /
            (col("__tf") + lit(k1) *
              (lit(1.0 - b) + lit(b) * (col("__dl") / col("__avgdl"))))
        ).as("__mills"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("__score_mills").desc, col("__doc").asc)
    contrib.groupBy(col("__qid"), col("__doc"))
      .agg(sum(col("__mills")).as("__score_mills"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("__qid").as(qidCol), col("rank"),
        col("__doc").as(idCol), col("__score_mills").as("score_mills"))
  }

  /** Top-k tf-idf keyword extraction per document — the
    * keyword/topic-proxy pass of a corpus-analysis pipeline (Salton &
    * Buckley's term weighting; Spärck Jones' idf). Scoring is the
    * RATIONAL idf variant of the module contract: score =
    * floor(1000·tf·N / df) in exact integers through DECIMAL(38,0)
    * (tf·N reaches ~10¹⁴ on real corpora; 1000·tf·N would overflow
    * int64 at 10¹⁷⁺ with heavy terms, so the product goes through the
    * 38-digit lane — the HUGEINT-twin contract). N/df is monotone in
    * the classic log(N/df), so per-term document ordering is
    * preserved; across terms the top-k set can deviate from the
    * log-idf set (log compresses rare-term dominance) — a documented
    * variant, spec-quantified against a float log-idf twin, the same
    * precedent as [[bm25TopK]].
    *
    * Scale shape: tf is one hash-agg shuffle on (doc, term); df
    * aggregates THAT frame (one row per distinct (doc, term)), so the
    * second shuffle is bounded by distinct pairs; N is a 1-row
    * broadcast; df joins back by term equi-shuffle (vocab-sized, not
    * forced broadcast). Ranking is a per-doc row_number the planner
    * cuts with WindowGroupLimit — no global sort, no pair space.
    *
    * @return (idCol, rank, term, tf, df_docs, tfidf_mills), rank 1..k
    *         per doc in (score desc, term asc) order; docs with no
    *         tokens produce no rows
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val reserved = Seq("rank", "term", "tf", "df_docs", "tfidf_mills", "__n")
    Seq(idCol, textCol).foreach(c =>
      require(!reserved.contains(c), s"column '$c' is reserved"))
    val ndocs = broadcast(docs.agg(count(lit(1)).as("__n")))
    val tf = docs
      .select(col(idCol), explode(
        TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf_mills").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .crossJoin(ndocs)
      .withColumn("tfidf_mills",
        expr("CAST((CAST(1000 AS DECIMAL(38,0)) * tf * __n) div df_docs AS BIGINT)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"),
        col("df_docs"), col("tfidf_mills"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    * several per-query rankings — the standard way a RAG data pipeline
    * merges lexical (BM25) and semantic (ANN) retrieval without score
    * calibration: each source contributes `1 / (k0 + rank)` and only
    * ranks matter, so wildly different score scales fuse cleanly.
    *
    * Contributions are exact integers, `1000000 div (k0 + rank)`
    * (integer floor-division — identical in any engine, no IEEE
    * subtleties at all); a document missing from a source contributes
    * 0. Ties in the fused score break on document id.
    *
    * Scale shape: every input is already a top-k ranking, so each
    * frame is |queries|·k rows — the fusion full-outer-joins and
    * windows over BOUNDED frames regardless of corpus size; all the
    * heavy lifting stayed in the upstream retrieval operators.
    *
    * @param rankings (sourceName, frame) pairs; each frame carries
    *                 `qidCol`, `idCol` and `rankCol` (1-based). Source
    *                 names become `rank_<name>` columns in the output.
    * @param k        fused ranks to keep per query
    * @param k0       RRF dampening constant (60 in the paper)
    * @return (qidCol, rank, idCol, rrf_mills, rank_<name>...), rank
    *         1..k per query by (rrf_mills desc, idCol asc)
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], qidCol: String,
      idCol: String, rankCol: String, k: Int, k0: Int = 60): DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two rankings")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranking source names must be distinct")
    require(k >= 1 && k0 >= 0, s"k=$k must be >= 1, k0=$k0 must be >= 0")
    // source names land in SQL text and col() lookups below — backtick-
    // quote them so a non-identifier name ("bm25-lex", "two words") makes
    // a valid column reference instead of misparsing (rank_bm25 MINUS lex)
    def quoted(name: String) = s"`rank_${name.replace("`", "``")}`"
    val tagged = rankings.map { case (name, df) =>
      df.select(col(qidCol), col(idCol),
        col(rankCol).cast("long").as(s"rank_$name"))
    }
    // full outer on (qid, id): a doc surfaced by ANY source competes
    val joined = tagged.reduce(_.join(_, Seq(qidCol, idCol), "full_outer"))
    val fused = rankings.map { case (name, _) =>
      coalesce(expr(s"1000000 div ($k0 + ${quoted(name)})"), lit(0L))
    }.reduce(_ + _)
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("rrf_mills").desc, col(idCol).asc)
    joined.withColumn("rrf_mills", fused)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(Seq(col(qidCol), col("rank"), col(idCol), col("rrf_mills")) ++
        rankings.map { case (name, _) => col(quoted(name)) }: _*)
  }
}
