package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 (rational-idf) lexical retrieval. The main gate recomputes the
  * whole scoring pipeline driver-side with the SAME frozen operand
  * order and compares bit-for-bit — any reassociation or type drift in
  * the operator breaks it, the same way the DuckDB oracle (q79) would.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus = Seq(
    1L -> "red apple pie with red apple",
    2L -> "green apple tart",
    3L -> "red wine sauce over red red meat",
    4L -> "plain bread",
    5L -> "apple apple apple apple",
    6L -> "")
  private val workload = Seq(
    10L -> "red apple",
    20L -> "bread",
    30L -> "nosuch zebra") // all terms absent: no rows for qid 30

  private def expected(k: Int, k1: Double, b: Double): Seq[(Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) =>
      id -> (if (t.trim.isEmpty) Seq.empty[String] else t.trim.split("\\s+").toSeq)
    }.toMap
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }
    val n = corpus.size.toLong
    val avgdl = dl.values.sum.toDouble / n
    val mills = for {
      (qid, qt) <- workload
      term <- qt.split(" ").distinct.toSeq
      postings = toks.collect { case (id, ts) if ts.contains(term) =>
        id -> ts.count(_ == term).toLong }
      if postings.nonEmpty
      df = postings.size.toLong
      (doc, tf) <- postings
    } yield (qid, doc) -> math.floor(
      1000.0 * ((n - df + 0.5) / (df + 0.5)) * (tf * (k1 + 1.0)) /
        (tf + k1 * ((1.0 - b) + b * (dl(doc) / avgdl)))).toLong
    mills.groupBy(_._1).toSeq
      .map { case ((qid, doc), xs) => (qid, doc, xs.map(_._2).sum) }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._2)).zipWithIndex.take(k)
          .map { case ((qid, doc, s), i) => (qid, i + 1L, doc, s) }
      }.sortBy(r => (r._1, r._2))
  }

  private def run(k: Int): Seq[(Long, Long, Long, Long)] =
    Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        workload.toDF("qid", "qtext"), "doc_id", "text", "qid", "qtext", k)
      .orderBy("qid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("bm25TopK matches an exact driver-side recomputation bit-for-bit") {
    assert(run(10) == expected(10, 1.2, 0.75))
    assert(run(10).exists(_._1 == 10L), "multi-term query must match")
    assert(!run(10).exists(_._1 == 30L), "all-absent-terms query must be empty")
  }

  test("bm25TopK top-k cut keeps ranks contiguous from 1") {
    val got = run(2)
    assert(got == expected(2, 1.2, 0.75))
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.size).toSeq)
      assert(rows.size <= 2)
    }
  }

  test("bm25TopK scores single-match queries sanely, rejects bad params") {
    // qid 20 ("bread"): doc 4 is the only match — exactly one row, rank
    // 1, positive score; a doc matching BOTH terms of qid 10 outranks
    // the red-only doc 3 despite doc 3's higher tf(red)
    val bread = run(10).filter(_._1 == 20L)
    assert(bread.map(r => (r._2, r._3)) == Seq((1L, 4L)) && bread.head._4 > 0L)
    val reds = run(10).filter(_._1 == 10L).map(_._3)
    assert(reds.indexOf(1L) < reds.indexOf(3L),
      s"two-term match should outrank one-term match here: $reds")
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus.toDF("doc_id", "text"),
        workload.toDF("qid", "qtext"), "doc_id", "text", "qid", "qtext", 0)
    }
  }

  test("rational-idf ranking agrees with a classic log-idf twin on the real corpus") {
    // The documented scoring deviation, QUANTIFIED: the operator's
    // rational idf (N-df+0.5)/(df+0.5) preserves per-term df ordering
    // but can reweigh multi-term sums vs classic BM25's
    // ln(1 + (N-df+0.5)/(df+0.5)) (the Lucene/Robertson form). This
    // canary runs the real operator on the sf0.01 corpus (5k docs,
    // near-uniform df plus the rare 'dup' term for maximal idf spread)
    // against a driver-side log-idf twin and pins the agreement floor —
    // a change that materially reorders results fails here even though
    // the bit-parity oracle (q79) would still pass.
    val k = 10
    val sfDir = "/root/testdata/sf0.01"
    val canaryQueries = graft.queries.TextQueries.Bm25Queries ++ Seq(
      (6L, "dup join"), (7L, "dup the scan"), (8L, "dup hash row batch"))
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val engineTopK: Map[Long, Seq[Long]] =
      Retrieval.bm25TopK(docsDf, canaryQueries.toDF("qid", "qtext"),
          "doc_id", "text", "qid", "qtext", k)
        .orderBy("qid", "rank").collect()
        .map(r => r.getLong(0) -> r.getLong(2)).toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // log-idf twin, recomputed driver-side with the same tf curve
    val corpusRows = docsDf.collect()
      .map(r => r.getLong(0) -> r.getString(1).trim)
    val toks = corpusRows.map { case (id, t) =>
      id -> (if (t.isEmpty) Seq.empty[String] else t.split("\\s+").toSeq)
    }.toMap
    val n = corpusRows.length.toLong
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val logTopK: Map[Long, Seq[Long]] = canaryQueries.map { case (qid, qt) =>
      val scores = qt.split(" ").distinct.toSeq.flatMap { term =>
        val postings = toks.collect { case (id, ts) if ts.contains(term) =>
          id -> ts.count(_ == term).toLong }
        val df = postings.size.toLong
        postings.map { case (doc, tf) =>
          doc -> (math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
            (tf * (1.2 + 1.0)) /
            (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (toks(doc).size / avgdl))))
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      qid -> scores.sortBy { case (doc, s) => (-s, doc) }.take(k).map(_._1)
    }.toMap
    val overlaps = canaryQueries.map(_._1).filter(engineTopK.contains).map { qid =>
      val o = (engineTopK(qid).toSet & logTopK(qid).toSet).size.toDouble / k
      (qid, o)
    }
    assert(overlaps.size >= 7, s"canary lost queries: $overlaps")
    // observed on this fixture: mean 0.925; the five uniform-df queries
    // sit at 1.0 and the three 'dup'-mixed ones at 0.9/0.8/0.7 — the
    // tail-idf reweighing is real but bounded. Floors leave headroom
    // for fixture regeneration, not for a scoring change: mean >= 0.8,
    // every query >= 0.6.
    val mean = overlaps.map(_._2).sum / overlaps.size
    info(s"rational-vs-log top-$k overlap: mean=$mean per-query=$overlaps")
    assert(mean >= 0.8, s"mean top-$k overlap $mean < 0.8: $overlaps")
    overlaps.foreach { case (qid, o) =>
      assert(o >= 0.6, s"query $qid top-$k overlap $o < 0.6")
    }
  }

  test("tfidfKeywords matches hand-computed scores, ties and edges") {
    // N=4 (the empty doc COUNTS toward N — idf is over the corpus,
    // not the tokenized subset); df(a)=df(b)=df(c)=2;
    // score = 1000·tf·N/df
    val docs = Seq(
      (1L, "a a b"),   // a: 4000, b: 2000
      (2L, "a c"),     // tie at 2000 — term-asc break: a then c
      (3L, "b b b c"), // b: 6000, c: 2000
      (4L, ""))        // no tokens: no rows
      .toDF("doc_id", "text")
    val got = Retrieval.tfidfKeywords(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, "a", 2L, 2L, 4000L), (1L, 2L, "b", 1L, 2L, 2000L),
      (2L, 1L, "a", 1L, 2L, 2000L), (2L, 2L, "c", 1L, 2L, 2000L),
      (3L, 1L, "b", 3L, 2L, 6000L), (3L, 2L, "c", 1L, 2L, 2000L)))
    intercept[IllegalArgumentException] {
      Retrieval.tfidfKeywords(docs, "doc_id", "text", 0)
    }
    intercept[IllegalArgumentException] {
      Retrieval.tfidfKeywords(
        docs.withColumnRenamed("text", "term"), "doc_id", "term", 2)
    }
  }

  test("rational-idf keyword sets agree with a log-idf twin on the real corpus") {
    // The documented deviation, QUANTIFIED (the bm25 canary's sibling):
    // tf·N/df preserves per-term doc ordering vs tf·ln(N/df) but can
    // reorder ACROSS terms (the rational idf stretches rare-term
    // dominance where log compresses it). Top-3 keyword sets per doc on
    // the sf0.001 corpus vs a driver-side float log-idf twin; floors
    // pinned from the measured fixture value with regeneration headroom.
    val k = graft.queries.TextQueries.KeywordTopK
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), lower(col("text")).as("text"))
    val engine: Map[Long, Set[String]] =
      Retrieval.tfidfKeywords(docsDf, "doc_id", "text", k)
        .select("doc_id", "term").as[(Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = docsDf.as[(Long, String)].collect()
    val toks = rows.map { case (id, t) =>
      id -> t.trim.split("\\s+").toSeq.filter(_.nonEmpty) }.toMap
    val n = rows.length.toDouble
    val dfreq = toks.values.flatMap(_.distinct).toSeq
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val logTop: Map[Long, Set[String]] = toks.collect {
      case (id, ts) if ts.nonEmpty =>
        id -> ts.groupBy(identity).toSeq
          .map { case (t, occ) => (t, occ.size * math.log(n / dfreq(t))) }
          .sortBy { case (t, s) => (-s, t) }.take(k).map(_._1).toSet
    }.toMap
    assert(engine.keySet == logTop.keySet)
    val overlap = engine.keys.toSeq.map(id =>
      (engine(id) intersect logTop(id)).size.toDouble / k)
    val mean = overlap.sum / overlap.size
    info(s"rational-vs-log top-$k keyword overlap: mean=$mean")
    assert(mean >= 0.7, s"mean keyword overlap $mean < 0.7")
  }

  test("rrfFuse merges rankings by reciprocal rank with integer contributions") {
    // qid 1: doc 100 is rank 1 lexically and rank 2 semantically;
    // doc 200 only lexical rank 2; doc 300 only semantic rank 1
    val lex = Seq((1L, 100L, 1L), (1L, 200L, 2L)).toDF("qid", "doc_id", "rank")
    val sem = Seq((1L, 300L, 1L), (1L, 100L, 2L)).toDF("qid", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem),
        "qid", "doc_id", "rank", k = 3, k0 = 60)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val c = (r: Long) => 1000000L / (60L + r)
    // doc 100 fuses both sources; 300 and 200 tie-break on single ranks
    assert(got.toSeq == Seq(
      (1L, 100L, c(1) + c(2)),
      (2L, 300L, c(1)),
      (3L, 200L, c(2))))
  }

  test("rrfFuse keeps top-k per query and breaks exact ties on doc id") {
    val lex = Seq((1L, 5L, 1L), (1L, 9L, 2L), (1L, 7L, 3L))
      .toDF("qid", "doc_id", "rank")
    // doc 9 and doc 7 swap ranks semantically -> identical fused
    // scores; doc id must decide
    val sem = Seq((1L, 5L, 1L), (1L, 7L, 2L), (1L, 9L, 3L))
      .toDF("qid", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq("lex" -> lex, "sem" -> sem),
        "qid", "doc_id", "rank", k = 2, k0 = 60)
      .orderBy("rank").collect()
      .map(r => r.getLong(2))
    assert(got.length == 2)
    assert(got(0) == 5L)
    assert(got(1) == 7L, "tie between doc 7 and doc 9 must go to the smaller id")
  }
}
