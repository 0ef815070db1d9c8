package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** tokenEntropy vs a driver-side Mitchell recompute: the n·L(n) − Σc·L(c)
  * algebra, the uniform/degenerate extremes, whitespace edges, the flag
  * threshold, and reserved-name guards. */
class TokenEntropySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Mitchell log2 in millibits (the TextFunctions.log2Mills contract). */
  private def lm(q: Long): Long = {
    require(q >= 1)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(q)
    1000L * e + ((1000L * (q - (1L << e))) >> e)
  }

  private def naive(text: String): (Long, Long, Long) = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
    val n = toks.length.toLong
    val s = counts.values.map(c => c * lm(c)).sum
    (n, counts.size.toLong, n * lm(n) - s)
  }

  test("entropy matches the driver recompute; extremes behave") {
    val docs = Seq(
      (1L, "a a a a a a a a"),          // degenerate: 0 entropy
      (2L, "a b c d e f g h"),          // uniform: L(8)=3000 per token
      (3L, "the cat sat on the mat"),
      (4L, "  x   y  x ")               // whitespace collapse
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, "doc_id", "text", 1500L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    for ((id, text) <- Seq(1L -> "a a a a a a a a", 2L -> "a b c d e f g h",
        3L -> "the cat sat on the mat", 4L -> "x y x")) {
      val (n, d, ent) = naive(text)
      val row = got.find(_._1 == id).get
      assert((row._2, row._3, row._4) == ((n, d, ent)), s"doc $id")
      assert(row._5 == (ent < n * 1500L), s"flag doc $id")
    }
    // doc 1: all-same tokens -> exactly zero entropy, flagged
    assert(got.find(_._1 == 1L).get._4 == 0L)
    assert(got.find(_._1 == 1L).get._5)
    // doc 2: 8 distinct of 8 -> exactly 8*L(8) = 24000 mills, unflagged
    assert(got.find(_._1 == 2L).get._4 == 24000L)
    assert(!got.find(_._1 == 2L).get._5)
  }

  test("reserved column names are rejected") {
    val df = Seq((1L, "a")).toDF("cnt", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.tokenEntropy(df, "cnt", "text", 0L)
    }
  }
}
