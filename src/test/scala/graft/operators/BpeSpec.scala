package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge learning vs a naive in-memory reference implementation
  * (list-of-symbols, greedy left-to-right merge, (count desc, pair asc)
  * argmax) — pins the weighted pair counts, the merge recurrence
  * (later rounds must see earlier merged symbols), greedy overlap
  * handling, and early exhaustion.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** reference BPE: words as symbol vectors. */
  private def naive(texts: Seq[String], rounds: Int): Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = texts
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val ((l, rt), w) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a + " " + b) }.head
        out += ((r.toLong, l, rt, l + rt, w))
        vocab = vocab.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i < syms.size - 1 && syms(i) == l && syms(i + 1) == rt) {
              b += l + rt; i += 2
            } else { b += syms(i); i += 1 }
          }
          b.result() -> f
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    out.result()
  }

  private def learned(texts: Seq[String], rounds: Int) =
    Bpe.learnMerges(texts.toDF("text"), "text", rounds)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq

  test("merges match the naive reference across rounds (recurrence included)") {
    val texts = Seq(
      "the the the then there", "that the other", "hehe hehehe he",
      "banana bandana", "aaa aa aaaa", "xy xy xyz")
    assert(learned(texts, 6) == naive(texts, 6))
  }

  test("greedy left-to-right overlap: aaa merges once, aaaa twice") {
    // one word "aaaa" (freq 1): round 1 pair (a,a) weight 3 (adjacent
    // positions), merge gives "aa aa"; overlapping middle pair is NOT
    // merged — the double-space delimiter contract
    val got = learned(Seq("aaaa"), 2)
    assert(got.head == ((1L, "a", "a", "aa", 3L)))
    assert(got(1) == ((2L, "aa", "aa", "aaaa", 1L)))
  }

  test("stops early when every word is a single symbol") {
    val got = learned(Seq("ab ab"), 5)
    // round 1 fuses ab; nothing left to pair
    assert(got == Seq((1L, "a", "b", "ab", 2L)))
  }

  test("PROPERTY: merges match the naive reference on random 3-char corpora") {
    // tiny alphabet + short words force heavy pair collisions, ties,
    // and overlap chains (aaa/aaaa) far denser than real text
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val texts = Seq.fill(6)(
        Seq.fill(rnd.nextInt(6) + 1)(
          Seq.fill(rnd.nextInt(4) + 1)("abc"(rnd.nextInt(3))).mkString)
          .mkString(" "))
      assert(learned(texts, 4) == naive(texts, 4),
        s"trial $trial corpus=$texts")
    }
  }

  /** reference encode: apply merges in rank order, greedy
    * left-to-right per merge — the training semantics. */
  private def naiveEncode(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    for ((l, r) <- merges) {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i < syms.size - 1 && syms(i) == l && syms(i + 1) == r) {
          b += l + r; i += 2
        } else { b += syms(i); i += 1 }
      }
      syms = b.result()
    }
    syms
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("encode reproduces the classic low/lower/lowest segmentations") {
    val texts = Seq("low low low lower lowest")
    val m = learned(texts, 2).map(t => (t._2, t._3))
    assert(m == Seq(("l", "o"), ("lo", "w")))
    val r = Bpe.encode(Seq((1L, texts.head)).toDF("doc_id", "text"),
      "text", "doc_id", m).head()
    assert(r.getAs[Long]("n_toks") == 5L)
    assert(r.getAs[Long]("n_chars") == 20L)
    // low→[low]×3, lower→[low,e,r], lowest→[low,e,s,t]
    assert(r.getAs[Long]("n_subwords") == 10L)
    assert(r.getAs[String]("enc_md5") == md5hex(
      "low | low | low | low  e  r | low  e  s  t"))
  }

  test("PROPERTY: encode(learnMerges) matches the naive round-trip on random corpora") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 8) {
      val texts = (1 to 6).map(_ =>
        (1 to (2 + rnd.nextInt(5)))
          .map(_ => (1 to (1 + rnd.nextInt(4)))
            .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
          .mkString(" "))
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val m = naive(texts, 3).map(t => (t._2, t._3))
      val got = Bpe.encode(docs, "text", "doc_id", m)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_subwords"), r.getAs[String]("enc_md5")))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val encs = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
          .map(w => naiveEncode(w, m))
        val expectMd5 = md5hex(encs.map(_.mkString("  ")).mkString(" | "))
        assert(got(i.toLong) == ((encs.map(_.size).sum.toLong, expectMd5)),
          s"trial $trial doc $i corpus=$t merges=$m")
      }
    }
  }


  test("symbols containing backslashes survive merge learning verbatim") {
    // 'a\\b' seeds the symbol '\\'; an expr()-built replace would run
    // Spark SQL escape processing and mangle '\\b' into a backspace
    val docs = Seq("a\\b a\\b").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", rounds = 2)
      .orderBy("round")
      .select("left", "right", "merged")
      .as[(String, String, String)].collect().toSeq
    assert(merges == Seq(("\\", "b", "\\b"), ("a", "\\b", "a\\b")))
    val enc = Bpe.encode(docs, "text", "text",
      merges.map { case (l, r, _) => (l, r) })
    assert(enc.select("n_subwords").as[Long].head() == 2L) // 'a\\b' twice -> 1 symbol each
  }
}
