package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EntityResolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val dict = Seq(
    ("Organic Green Tea", "P1"),
    ("Almond Milk", "P2"),
    ("Whole Wheat Flour", "P3"),
    ("Sea Salt", "P4")).toDF("title", "ext_id")

  lazy val items = Seq(
    (1L, "organic green tea"),     // exact (case-insensitive) -> resolved 100
    (2L, "green tea organic"),     // token reorder: tsr 100 but the
                                   // algorithm-disagreement penalty (F5)
                                   // drops it to 85 -> review, like the ref
    (3L, "almond milkk"),          // near miss -> review band
    (4L, "quantum flux capacitor") // garbage -> rejected
  ).toDF("item_id", "item_name")

  test("exact phase matches case-insensitively with score 100 (J1)") {
    val out = EntityResolution.resolve(items, dict, Seq("item_id"))
      .orderBy("item_id").collect()
    val r1 = out(0)
    assert(r1.getAs[String]("decision") == "resolved")
    assert(r1.getAs[String]("ext_id") == "P1")
    assert(r1.getAs[Double]("score") == 100.0)
  }

  test("fuzzy phase routes bands: resolve / review / reject (J2/F6)") {
    val out = EntityResolution.resolve(items, dict, Seq("item_id"))
      .orderBy("item_id").collect()
    assert(out(1).getAs[String]("decision") == "review")
    assert(out(1).getAs[String]("ext_id") == "P1")
    assert(out(1).getAs[Double]("score") == 85.0)
    assert(out(2).getAs[String]("decision") == "review")
    assert(out(2).getAs[String]("ext_id") == "P2")
    assert(out(3).getAs[String]("decision") == "rejected")
    assert(out(3).getAs[String]("ext_id") == null)
  }

  test("blocked fuzzy join agrees with broadcast cross join on matches") {
    val un = EntityResolution.resolve(items, dict, Seq("item_id"))
      .select("item_id", "ext_id", "decision").orderBy("item_id").collect()
    val bl = EntityResolution.resolve(items, dict, Seq("item_id"), blocked = true)
      .select("item_id", "ext_id", "decision").orderBy("item_id").collect()
    // items sharing >= 1 token with their match must agree; the garbage
    // row has no shared token so the blocked variant rejects it too.
    assert(un.map(_.toString).toSeq == bl.map(_.toString).toSeq)
  }

  test("char-3-gram blocking reaches zero-shared-token near-matches (J2 recall)") {
    // none of these share a whitespace token with their dictionary match,
    // so token blocking alone generates zero candidates; the 3-gram
    // family must still surface them with a non-rejected decision.
    val tricky = Seq(
      (1L, "almondmilk"),        // concatenation
      (2L, "al mondmilk"),       // misplaced space
      (3L, "almondd milkk")      // per-token typos (no token matches)
    ).toDF("item_id", "item_name")
    val out = EntityResolution.resolve(tricky, dict, Seq("item_id"), blocked = true)
      .orderBy("item_id").collect()
    out.foreach { r =>
      assert(r.getAs[String]("decision") != "rejected",
        s"item ${r.getAs[String]("item_name")} unreachable under blocking")
      assert(r.getAs[String]("ext_id") == "P2")
    }
    // and the blocked decisions agree with the unblocked ground truth
    val un = EntityResolution.resolve(tricky, dict, Seq("item_id"))
      .select("item_id", "ext_id", "score", "decision").orderBy("item_id").collect()
    val bl = EntityResolution.resolve(tricky, dict, Seq("item_id"), blocked = true)
      .select("item_id", "ext_id", "score", "decision").orderBy("item_id").collect()
    assert(un.map(_.toString).toSeq == bl.map(_.toString).toSeq)
  }

  test("gram family is a gated RESCUE pass: strong token matches see only token candidates") {
    // "salty almond milk" token-blocks to "Almond Milk" with raw
    // token_set_ratio 100 (its token set contains the match's) ->
    // strong -> NOT rescued, even though it shares grams 'sal'/'alt'
    // with "Sea Salt"; were the gram family ungated, Sea Salt would be
    // paired. "wholewheat" shares no token with anything -> rescued ->
    // gram candidates only.
    val tricky = Seq(
      (1L, "salty almond milk"), // strong token match
      (2L, "wholewheat")         // zero token candidates -> rescued
    ).toDF("item_id", "item_name")
    val cands = EntityResolution.fuzzyCandidates(
      tricky.select("item_name").distinct(), dict,
      "item_name", "title", "ext_id", blocked = true)
      .select("item_name", "cand_title")
      .as[(String, String)].collect().toSet
    // strong name: candidates are EXACTLY its token-block set
    assert(cands.filter(_._1 == "salty almond milk") ==
      Set(("salty almond milk", "Almond Milk")))
    // rescued name: reached through grams ('whe'/'hea'/'eat' ∈ Whole
    // Wheat Flour), which token blocking alone cannot produce
    assert(cands.filter(_._1 == "wholewheat") ==
      Set(("wholewheat", "Whole Wheat Flour")))
  }

  test("rescue is two-phase: a weak token-blocked name gets gram candidates too") {
    // 'almondmilk co' token-blocks only to 'Tea Co' (shared 'co'), a
    // weak candidate that lands below the reject floor; its true match
    // 'Almond Milk' shares NO whitespace token and is reachable only
    // through grams. Zero-candidate gating would never pair it (the
    // round-5 ADVICE recall finding) and the blocked path would reject
    // where the unblocked/reference path reviews; the two-phase gate
    // must generate it and agree with the unblocked ground truth.
    val d2 = Seq(("Tea Co", "T1"), ("Almond Milk", "A1"))
      .toDF("title", "ext_id")
    val t2 = Seq((1L, "almondmilk co")).toDF("item_id", "item_name")
    val cands = EntityResolution.fuzzyCandidates(
      t2.select("item_name").distinct(), d2,
      "item_name", "title", "ext_id", blocked = true)
      .select("item_name", "cand_title")
      .as[(String, String)].collect().toSet
    assert(cands == Set(
      ("almondmilk co", "Tea Co"),
      ("almondmilk co", "Almond Milk")))
    // and resolution lands on the gram-only candidate, matching the
    // unblocked (full cross join) ground truth
    val un = EntityResolution.resolve(t2, d2, Seq("item_id"))
      .select("item_id", "ext_id", "score", "decision").collect()
    val bl = EntityResolution.resolve(t2, d2, Seq("item_id"), blocked = true)
      .select("item_id", "ext_id", "score", "decision").collect()
    assert(un.map(_.toString).toSeq == bl.map(_.toString).toSeq)
    assert(bl(0).getAs[String]("ext_id") == "A1", bl(0).toString)
    assert(bl(0).getAs[String]("decision") != "rejected", bl(0).toString)
  }

  test("penalties never raise a score and floor at 0 (F4)") {
    val df = Seq(
      ("short", "a much longer candidate string with many words"),
      ("same", "same")).toDF("a", "b")
      .withColumn("adj", EntityResolution.applyPenalties(lit(80.0), col("a"), col("b")))
    val rows = df.select("adj").as[Double].collect()
    assert(rows(0) < 80.0 && rows(0) >= 0.0)
    assert(rows(1) == 80.0)
  }

  test("dietary penalty fires on the reference term list, not substrings of old terms (F4)") {
    // isolate the dietary term: equal lengths, word counts, no digits,
    // no special chars -> only the presence-of-any mismatch remains
    val df = Seq(
      ("organic flour", "regular flour"), // 'organic' in the ref list -> 20
      ("vegan bread", "fresh bread")      // 'vegan' is NOT in the ref list
    ).toDF("a", "b")
      .withColumn("adj", EntityResolution.applyPenalties(lit(80.0), col("a"), col("b")))
    val rows = df.select("adj").as[Double].collect()
    assert(rows(0) == 60.0, s"expected dietary -20, got ${rows(0)}")
    assert(rows(1) == 80.0, s"'vegan' must not trigger the reference list, got ${rows(1)}")
  }

  test("special-char penalty counts the literal !@#$%^&*() set (F4)") {
    // '?' is outside the reference's counted set, '!' inside: counts 1 vs 0
    val df = Seq(("ab!", "ab?"), ("ab!", "ab!")).toDF("a", "b")
      .withColumn("adj", EntityResolution.applyPenalties(lit(80.0), col("a"), col("b")))
    val rows = df.select("adj").as[Double].collect()
    assert(rows(0) == 65.0, s"count mismatch must cost 15, got ${rows(0)}")
    assert(rows(1) == 80.0)
  }

  test("alternatives only carry for the review band and are deterministic") {
    val out = EntityResolution.resolve(items, dict, Seq("item_id"))
      .orderBy("item_id").collect()
    // resolved (exact) and rejected rows carry no alternatives
    assert(out(0).getAs[scala.collection.Seq[_]]("alternatives") == null)
    assert(out(3).getAs[scala.collection.Seq[_]]("alternatives") == null)
    // repeated runs produce the identical alternatives array (canonical
    // raw-rank ordering, not collect_list arrival order)
    val again = EntityResolution.resolve(items, dict, Seq("item_id"))
      .orderBy("item_id").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("alternatives exclude the winner and respect the reject floor (W3)") {
    val manyDict = Seq(
      ("green tea", "G1"), ("green tea extract", "G2"),
      ("green tea powder", "G3"), ("black tea", "G4")).toDF("title", "ext_id")
    val one = Seq((1L, "greem tea")).toDF("item_id", "item_name")
    val out = EntityResolution.resolve(one, manyDict, Seq("item_id")).collect()(0)
    val alts = out.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("alternatives")
    assert(alts != null && alts.nonEmpty)
    assert(!alts.map(_.getAs[String]("ext_id")).contains(out.getAs[String]("ext_id")))
  }
}
