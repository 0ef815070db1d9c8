package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bulk labeled match-quality regression (SURVEY §5 item 5): a corpus
  * shaped like the reference's seed workbook (`seed_data/Training Data
  * + Matching IDs.xlsx`, ~5,100 title→ID pairs over three sheets) —
  * 1,700 canonical titles × 3 labeled variants = 5,100 pairs spanning
  * the three decision bands — resolved through the BLOCKED (100 TB)
  * path and scored band-level, so a change anywhere in the
  * exact/fuzzy/penalty/banding chain that shifts aggregate match
  * quality fails here even when every synthetic edge-case spec still
  * passes.
  *
  * The corpus is DETERMINISTIC (combinatorial, no RNG): titles are
  * "adj base form" triples over disjoint word lists, so distinct
  * titles never share a full token set and true-id attribution is
  * unambiguous by construction.
  *
  * Expected-band engineering, pinned against the reference's routing
  * (`app/etl.py:40-42, 1318-1374`):
  *  - HIGH: case-mangled (exact-key hit, score 100) or inner double
  *    space (token_set_ratio 100, only the ~1-point length penalty)
  *    → "resolved" with the true id, every time.
  *  - MID: token reorder (tsr 100 with the true title, but the
  *    algorithm-disagreement cross-check fires → 85 review; since the
  *    cross-penalty hits only the RAW-best candidate — the reference's
  *    rule, `app/etl.py:1318-1343` — a near-tie sibling often overtakes
  *    it as the adjusted best, and the true title lands in the
  *    alternatives via its raw rank) or a double typo (first vowel
  *    dropped from the adjective AND the form — measured median score
  *    ~94, all review, true title the unambiguous best ~78% and in
  *    best∪alternatives ~86%). Floors pinned just under measured
  *    rates on the 143-title sample grid.
  *  - LOW: out-of-vocabulary gibberish → "rejected" (zero token
  *    candidates; the gram rescue pass may pair it, but never ≥ 50).
  */
class MatchQualityRegressionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val adjs = Seq("organic", "roasted", "golden", "alpine",
    "coastal", "heritage", "smoked", "wild", "stoneground", "velvet")
  private val bases = Seq("green tea", "almond butter", "quinoa flour",
    "basil pesto", "cashew milk", "rye sourdough", "maple syrup",
    "chili paste", "ginger tonic", "cocoa nibs", "barley malt",
    "lentil soup", "olive tapenade", "saffron rice", "walnut oil",
    "berry compote", "oat granola")
  private val forms = Seq("extract", "powder", "capsules", "sachets",
    "concentrate", "infusion", "spread", "crackers", "bites", "pressing")

  /** 1,700 canonical (title, id) rows — the dictionary side. */
  private lazy val canon: Seq[(String, String)] =
    (for {
      (a, ia) <- adjs.zipWithIndex
      (b, ib) <- bases.zipWithIndex
      (f, ifm) <- forms.zipWithIndex
    } yield (s"$a $b $f", f"X${ia * 170 + ib * 10 + ifm}%04d")).toSeq

  private def dropFirstVowel(w: String): String = {
    val i = w.indexWhere("aeiou".contains(_))
    if (i < 0) w else w.substring(0, i) + w.substring(i + 1)
  }

  /** 5,100 labeled pairs: (pair_id, item_name, true_id, band). */
  private lazy val pairs: Seq[(Long, String, String, String)] =
    canon.zipWithIndex.flatMap { case ((title, id), i) =>
      val words = title.split(" ")
      val high =
        if (i % 2 == 0) title.toUpperCase
        else words.head + "  " + words.tail.mkString(" ")
      val mid =
        if (i % 2 == 0) (words.tail :+ words.head).mkString(" ")
        else (dropFirstVowel(words.head) +: words.tail.init :+
          dropFirstVowel(words.last)).mkString(" ")
      val low = s"zephyrwing quovax brumblet ${i}"
      Seq(
        (i * 3L, high, id, "high"),
        (i * 3L + 1, mid, id, "mid"),
        (i * 3L + 2, low, id, "low"))
    }

  test("5,100-pair labeled corpus: band routing and id accuracy hold " +
    "through the blocked path (SURVEY §5 item 5)") {
    val dict = canon.toDF("title", "ext_id")
    val items = pairs.toDF("pair_id", "item_name", "true_id", "band")
    val out = EntityResolution
      .resolve(items, dict, Seq("pair_id"), blocked = true)
      .select($"pair_id", $"band", $"true_id", $"ext_id", $"score",
        $"decision", $"alternatives")
      .collect()
    assert(out.length == 5100)

    val byBand = out.groupBy(_.getAs[String]("band"))
    def rate(rows: Array[org.apache.spark.sql.Row])(
        p: org.apache.spark.sql.Row => Boolean): Double =
      rows.count(p).toDouble / rows.length

    // HIGH: every pair resolves to its true id at score ≥ 97
    val high = byBand("high")
    assert(rate(high)(r => r.getAs[String]("decision") == "resolved" &&
      r.getAs[String]("ext_id") == r.getAs[String]("true_id")) == 1.0,
      "every high-band variant must auto-resolve to its true id")

    // MID: ≥ 92% review (measured: reorders ~95%, typos 100%);
    // NOTHING resolves to a wrong id; true id in best∪alternatives at
    // the measured floors — structurally 100% for reorders (the true
    // title is raw_rn=1, so if a sibling overtakes it as adjusted best
    // it becomes the FIRST alternative), ≥ 84% for the typo half
    val mid = byBand("mid")
    assert(rate(mid)(_.getAs[String]("decision") == "review") >= 0.92,
      "mid-band variants must overwhelmingly route to review")
    assert(mid.forall(r => r.getAs[String]("decision") != "resolved" ||
      r.getAs[String]("ext_id") == r.getAs[String]("true_id")),
      "a mid-band variant must never auto-resolve to a WRONG id")
    def inAlts(r: org.apache.spark.sql.Row): Boolean = {
      val alts = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](
        "alternatives")
      alts != null && alts.exists(
        _.getAs[String]("ext_id") == r.getAs[String]("true_id"))
    }
    def covered(r: org.apache.spark.sql.Row): Boolean =
      r.getAs[String]("ext_id") == r.getAs[String]("true_id") || inAlts(r)
    // mid pair_id = 3i+1 → recover the title index i to split halves
    val (midReorder, midTypo) =
      mid.partition(r => ((r.getLong(0) - 1) / 3) % 2 == 0)
    val reorderReview =
      midReorder.filter(_.getAs[String]("decision") == "review")
    assert(rate(reorderReview)(covered) == 1.0,
      "reordered reviews must ALWAYS carry the true id in best∪alts " +
        "(raw-rank-1 structural guarantee)")
    val typoReview = midTypo.filter(_.getAs[String]("decision") == "review")
    assert(rate(typoReview)(covered) >= 0.84,
      "typo reviews must carry the true id in best∪alts ≥ 84%")
    assert(rate(typoReview)(r =>
      r.getAs[String]("ext_id") == r.getAs[String]("true_id")) >= 0.70,
      "typo reviews must have the true id as BEST ≥ 70%")

    // LOW: everything rejects — gibberish must never reach the review
    // band, let alone resolve
    val low = byBand("low")
    assert(rate(low)(_.getAs[String]("decision") == "rejected") == 1.0,
      "out-of-vocabulary gibberish must always reject")

    // corpus-wide precision: no wrong-id auto-resolve anywhere
    assert(out.forall(r => r.getAs[String]("decision") != "resolved" ||
      r.getAs[String]("ext_id") == r.getAs[String]("true_id")),
      "zero wrong-id auto-resolves across the whole corpus")

    info(s"band sizes: ${byBand.view.mapValues(_.length).toMap}")
    info(s"mid review share: ${rate(mid)(_.getAs[String]("decision") == "review")}")
    info(s"reorder-review coverage: ${rate(reorderReview)(covered)} " +
      s"(n=${reorderReview.length})")
    info(s"typo-review coverage: ${rate(typoReview)(covered)}, " +
      s"best-true: ${rate(typoReview)(r => r.getAs[String]("ext_id") == r.getAs[String]("true_id"))} (n=${typoReview.length})")
  }
}
