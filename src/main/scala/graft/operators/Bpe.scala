package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Byte-pair-encoding merge learning (Sennrich, Haddow & Birch 2016,
  * ACL — the subword tokenizer-training prep of every modern LLM data
  * pipeline): iteratively find the most frequent adjacent symbol pair
  * across the corpus and fuse it into a new symbol.
  *
  * Scale design — the standard word-frequency factorization: the ONLY
  * corpus-sized pass is the initial token count (one hash-agg shuffle,
  * output bounded by |vocab|). Every merge round then operates on the
  * word-frequency table alone — pair counts are an explode over
  * per-word symbol arrays weighted by word frequency (vocab-bounded,
  * corpus-size-independent), so 50k merge rounds on 100 TB cost the
  * same per round as on 1 GB. Per round exactly ONE row (the argmax
  * pair) is collected to the driver — the bounded-anchor precedent of
  * the k-means centroid loop.
  *
  * Segmentations ride as strings — symbols joined by TWO spaces with a
  * single-space pad (" w  o  r  d ") — so a merge is one engine-portable
  * literal `replace(seq, " a  b ", " ab ")`: left-to-right,
  * non-overlapping, continuing after each replacement, which is exactly
  * BPE's greedy merge order, and the double-space separator keeps
  * adjacent matches from consuming each other's boundary (the classic
  * " a b a b " single-space bug). Symbols never contain spaces by
  * construction (whitespace tokenization), so matches can't cross
  * symbol boundaries.
  *
  * Determinism: pair weights are exact integer sums; the per-round
  * argmax breaks ties on the pair string ascending.
  */
object Bpe {

  private val outSchema = StructType(Seq(
    StructField("round", LongType, nullable = false),
    StructField("left", StringType, nullable = false),
    StructField("right", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("weight", LongType, nullable = false)))

  /** Learn the first `rounds` BPE merges over `textCol`'s whitespace
    * tokens. Returns (round, left, right, merged, weight) — one row
    * per learned merge, round 1-based in merge order. Rounds stop
    * early if no pair remains (all words fused to single symbols). */
  /** Seed segmentation: every char its own symbol, in the double-space
    * boundary form — THE train/encode parity contract (learnMerges
    * trains on exactly what encode re-derives), so one definition. */
  private def seedSegmentation(c: Column): Column =
    concat(lit(" "), trim(regexp_replace(c, "(.)", "$1  ")), lit(" "))

  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 10000, s"rounds=$rounds out of range")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("seq", seedSegmentation(col("word")))
      // the vocab table is the loop's base frame: pin it once so merge
      // rounds never re-run the corpus-sized token count
      .localCheckpoint(true)

    var seq = words.select(col("freq"), col("seq"))
    var prevPin = words // blocks the current seq projection reads
    val merges = Seq.newBuilder[Row]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val arr = split(trim(col("seq")), "  ")
      val top = seq
        .select(col("freq"), explode(zip_with(
          slice(arr, lit(1), size(arr) - 1),
          slice(arr, lit(2), size(arr) - 1),
          (a, b) => concat(a, lit(" "), b))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("w"))
        .orderBy(col("w").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) { exhausted = true }
      else {
        val pair = top.head.getString(0)
        val w = top.head.getLong(1)
        val parts = pair.split(" ", 2)
        val (l, rt) = (parts(0), parts(1))
        merges += Row(r.toLong, l, rt, l + rt, w)
        // lit()-based replace, the same path encode() applies: no SQL
        // string re-parse, so symbols containing backslashes or quotes
        // round-trip verbatim (expr("replace(seq,'...')") would run
        // Spark SQL escape processing and mangle '\\b' into backspace).
        seq = seq.withColumn("seq",
          replace(col("seq"), lit(s" $l  $rt "), lit(s" ${l + rt} ")))
        // re-pin the vocab frame periodically: without this each round's
        // collect() replays every prior replace (O(rounds²) work and an
        // unboundedly nested expression tree); with it the per-round cost
        // stays flat, as the module doc promises. The frame is
        // vocab-bounded, so the eager checkpoint is cheap. Unpersist the
        // prior pin once the new one is materialized (the q53 chain
        // discipline) so long runs don't accumulate stale vocab copies.
        if (r % BpeCheckpointEvery == 0) {
          seq = seq.localCheckpoint(true)
          prevPin.unpersist()
          prevPin = seq
        }
        r += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.result(), 1), outSchema)
  }

  /** Rounds between eager re-pins of the segmentation frame — bounds
    * the nested-replace expression depth and keeps per-round cost flat. */
  private val BpeCheckpointEvery = 24

  /** Apply learned merges to tokenize a corpus — the ENCODE half of
    * BPE (what the trained tokenizer does to every document at
    * training-data-prep time). Each token is char-segmented into the
    * same double-space form [[learnMerges]] trains on, then the merge
    * list is applied IN RANK ORDER as literal replaces — greedy
    * left-to-right non-overlapping, exactly the training semantics, so
    * encode(learnMerges(corpus)) reproduces the training
    * segmentations.
    *
    * Scale shape: the merge table is driver-side (bounded: the learned
    * rounds, the k-means-centroid anchor precedent) and rides the plan
    * as LITERALS inside one `transform` lambda over the token array —
    * the whole encode is a scan-side projection: no join, no shuffle,
    * nothing but the scan at any corpus size.
    *
    * Output per doc with ≥ 1 token: n_toks, n_chars (pre-merge symbol
    * count), n_subwords (post-merge), enc_md5 (md5 of the per-token
    * segmentations joined by " | " in token order — pins the EXACT
    * segmentation, not just counts). */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    // expression depth is linear in |merges| (one nested replace per
    // merge inside the transform lambda) — cap at learnMerges' own
    // rounds bound so an unbounded table can't push Catalyst/codegen
    // past their tree-depth limits
    require(merges.size <= 10000, s"${merges.size} merges exceed the 10000 cap")
    merges.foreach { case (l, r) =>
      require(l.nonEmpty && r.nonEmpty && !l.contains(" ") && !r.contains(" "),
        s"malformed merge ('$l', '$r')")
    }
    val toks = TextFunctions.tokens(col(textCol))
    val enc = transform(toks, t => {
      val merged = merges.foldLeft(seedSegmentation(t)) { case (c, (l, r)) =>
        replace(c, lit(s" $l  $r "), lit(s" ${l + r} "))
      }
      trim(merged)
    })
    docs
      .select(col(idCol), toks.as("__toks"), enc.as("__enc"))
      .where(size(col("__toks")) > 0)
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_toks"),
        aggregate(col("__toks"), lit(0L), (acc, t) => acc + length(t))
          .as("n_chars"),
        aggregate(col("__enc"), lit(0L),
          (acc, e) => acc + size(split(e, "  ")))
          .as("n_subwords"),
        md5(array_join(col("__enc"), " | ")).as("enc_md5"))
  }
}
