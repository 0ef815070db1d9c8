package graft.operators

import graft.SparkTestSession
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
}
