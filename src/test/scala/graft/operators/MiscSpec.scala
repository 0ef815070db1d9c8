package graft.operators

import graft.SparkTestSession
import graft.functions.Normalize
import graft.streaming.Incremental
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object MiscSpec {
  val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
}

class MiscSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q81 exact discrete percentiles match a naive sort; sketch in bound") {
    val dir = graft.SparkTestSession.sfDir
    val out = graft.SparkEntry.queries("q81_quantile_sketch")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    val byLang = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
      .map { case (l, xs) => l -> xs.map(_._2).sorted.toIndexedSeq }
    assert(out.size == byLang.size * 3)
    for ((lang, vals) <- byLang;
         (p, num, den) <- graft.queries.TextQueries.QuantilePercentiles) {
      val pm = p.toLong
      val rank = (vals.size.toLong * num + den - 1) / den // ceil(p*n), 1-based
      val (exactVal, inBound) = out((lang, pm))
      assert(exactVal == vals((rank - 1).toInt), s"$lang p$pm")
      assert(inBound, s"$lang p$pm sketch out of bound")
    }
  }

  test("stateful sessionization emits gap-closed sessions (event-time state)") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val evs = Seq(
      Incremental.Event(1L, at(0), "a"),
      Incremental.Event(1L, at(10), "b"),   // same session
      Incremental.Event(1L, at(50), "c"),   // > 30 min gap -> closes (1,2)
      Incremental.Event(2L, at(0), "a")).toDS()
    // append semantics: only CLOSED sessions surface — user 1's first
    // session (2 events) splits at the in-batch gap; the trailing open
    // sessions (u1's 1-event, u2's 1-event) stay in state for the
    // watermark to close (StreamingSpec covers that path end-to-end)
    val out = Incremental.sessionize(evs).collect().map(s => s.user_id -> s.n_events).toMap
    assert(out == Map(1L -> 2L), out.toString)
  }

  test("repetition filter flags boilerplate docs and passes varied ones") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now"),      // one bigram dominates
      (2L, "the quick brown fox jumps over the lazy dog"),  // varied
      (3L, "ab")                                            // < 3 tokens: excluded
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("top_bigram_share_mills"), r.getAs[Boolean]("repetition_ok"))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(!out(1L)._2 && out(1L)._1 > TextAnalysis.MaxTopBigramShareMills)
    assert(out(2L)._2)
  }

  test("sequence packing: concat-then-chunk invariants per shard") {
    // shard A: 3+4+5+2 tokens at budget 6 -> chunk stream:
    //   d1 starts at 0  (seq 0, off 0)
    //   d2 starts at 3  (seq 0, off 3)
    //   d3 starts at 7  (seq 1, off 1)
    //   d4 starts at 12 (seq 2, off 0)
    // shard B packs independently from offset 0
    val docs = Seq(
      (1L, "A", "a b c"), (2L, "A", "d e f g"), (3L, "A", "h i j k l"),
      (4L, "A", "m n"), (10L, "B", "x y z w")).toDF("doc_id", "source", "text")
    val out = TextAnalysis.packSequences(docs, "text", "doc_id", "source", 6)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "seq_no", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 0L, 0L), (2L, 4L, 0L, 3L), (3L, 5L, 1L, 1L),
      (4L, 2L, 2L, 0L), (10L, 4L, 0L, 0L)), out.toString)
    // invariant: every offset is inside the budget
    assert(out.forall(_._4 < 6))
  }

  test("stratified sampling is deterministic and tracks the stratum rate") {
    val docs = (0L until 1000L).map(i =>
      (i, if (i % 2 == 0) "hi" else "lo")).toDF("doc_id", "lang")
    def run() = TextAnalysis.stratifiedSample(docs, "lang", "doc_id",
      Map("hi" -> 1.0, "lo" -> 0.3), defaultRate = 0.0)
      .select("doc_id").as[Long].collect().toSet
    val kept = run()
    // rate 1.0 keeps the whole stratum; 0.3 lands near 30% (md5 uniform)
    assert(kept.count(_ % 2 == 0) == 500)
    val lo = kept.count(_ % 2 == 1)
    assert(lo > 100 && lo < 200, s"lo stratum kept $lo of 500 at rate 0.3")
    // no RNG: identical membership on re-run
    assert(run() == kept)
    // a stratum not in the table gets the default rate (here: dropped)
    val none = TextAnalysis.stratifiedSample(docs, "lang", "doc_id",
      Map("other" -> 1.0), defaultRate = 0.0).count()
    assert(none == 0)
  }

  test("pushSink retries transient failures with backoff (F14)") {
    MiscSpec.attempts.set(0)
    val df = Seq(1, 2, 3).toDF("v").coalesce(1)
    // JVM-static counter: foreachPartition serializes the closure, so a
    // captured local would be a copy even in local mode.
    Merge.pushSink(df, rows => {
      if (MiscSpec.attempts.incrementAndGet() == 1) sys.error("transient")
      assert(rows.size == 3)
    }, batchSize = 10, maxRetries = 2, baseDelayMs = 1L)
    assert(MiscSpec.attempts.get() == 2)
  }

  test("pushSummary aggregates per-entity outcomes (A6)") {
    val results = Seq(
      ("member", true), ("member", true), ("product", true),
      ("ingredient", false)).toDF("entity", "ok")
    val r = Reports.pushSummary(results).collect()(0)
    assert(r.getAs[Long]("members_pushed") == 2)
    assert(r.getAs[Long]("products_created") == 1)
    assert(r.getAs[Long]("errors") == 1)
  }

  test("createdItems three-way union aligns columns (U2)") {
    val p = Seq(("Oat Milk", "product")).toDF("title", "kind")
    val i = Seq(("Salt", "ingredient")).toDF("title", "kind")
    val o = Seq(("France", "country", "extra")).toDF("title", "kind", "note")
    val u = Reports.createdItems(p, i, o)
    assert(u.count() == 3 && u.columns.toSet == Set("title", "kind", "note"))
  }

  test("payloadBytes measures JSON size of a struct (F12)") {
    val n = Seq(("a", 1)).toDF("k", "v")
      .select(Normalize.payloadBytes(struct($"k", $"v")).as("b")).as[Long].head()
    assert(n == """{"k":"a","v":1}""".length)
  }

  test("decisionStatus derivation covers all branches (F8)") {
    val rows = Seq(
      (true, false, false), (false, true, true), (false, true, false),
      (false, false, false)).toDF("ignored", "approved", "resolved")
      .select(Normalize.decisionStatus($"ignored", $"approved", $"resolved").as("s"))
      .as[String].collect()
    assert(rows.toSeq == Seq("Ignored", "Matched to Existing", "Created as New", "Unknown"))
  }
}
