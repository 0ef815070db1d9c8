package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-stream").toString

  test("ST1: file-source ingest is exactly-once across restarts") {
    val in = tmp(); val out = tmp(); val cp = tmp()
    val batch1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    batch1.write.mode("append").parquet(in)
    val schema = batch1.schema
    Incremental.fileSourceIngest(spark, in, schema, cp, out)
    assert(spark.read.parquet(out).count() == 2)
    // second run with no new files must be a no-op (idempotent skip)
    Incremental.fileSourceIngest(spark, in, schema, cp, out)
    assert(spark.read.parquet(out).count() == 2)
    // new file -> only the delta lands
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(in)
    Incremental.fileSourceIngest(spark, in, schema, cp, out)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("ST2: watermarked tumbling windows over the events stream") {
    val eventsDir = tmp(); val cp = tmp()
    val src = graft.Tables(spark, graft.SparkTestSession.sfDir, "events")
    src.write.mode("overwrite").parquet(eventsDir)
    val stream = spark.readStream
      .schema(spark.read.parquet(eventsDir).schema)
      .parquet(eventsDir)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("win_counts")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("win_counts")
    // append mode emits only watermark-closed windows; all but the last
    // hour of the deterministic dataset are closed.
    val batchEquivalent = src
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    assert(got.count() > 0)
    assert(got.count() <= batchEquivalent.count())
    // every emitted row must equal its batch twin exactly
    val joined = got.join(batchEquivalent, Seq("window", "event_type"))
      .where(got("n") =!= batchEquivalent("n"))
    assert(joined.count() == 0)
  }

  test("streaming dedup emits exactly the first occurrence per key") {
    val in = tmp(); val cp = tmp(); val out = tmp()
    Seq(("k1", 5L), ("k1", 3L), ("k2", 7L))
      .toDF("key", "id").write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    // memory sinks cannot recover from a checkpoint, and state recovery
    // across drains is exactly what's under test -> parquet sink
    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(in)
        .as[Incremental.Keyed]
      val q = Incremental.streamingDedup(stream)
        .writeStream
        .outputMode(OutputMode.Append)
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val first = spark.read.parquet(out).as[Incremental.FirstSeen].collect()
      .map(f => f.key -> f.id).toMap
    assert(first == Map("k1" -> 3L, "k2" -> 7L),
      "first batch must emit min id per key")
    // a later file with duplicate and new keys: only the new key lands
    Seq(("k1", 1L), ("k3", 9L)).toDF("key", "id").write.mode("append").parquet(in)
    drain()
    val all = spark.read.parquet(out).as[Incremental.FirstSeen].collect()
      .map(f => f.key -> f.id).toMap
    assert(all == Map("k1" -> 3L, "k2" -> 7L, "k3" -> 9L),
      "duplicates across batches must be suppressed by state")
  }

  test("event-time sessionization closes sessions by watermark, not wall clock") {
    val in = tmp(); val cp = tmp(); val out = tmp()
    def ts(min: Int) = new java.sql.Timestamp(3600L * 1000 * 24 + min * 60000L)
    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema).parquet(in)
        .as[Incremental.Event]
      val q = Incremental.sessionize(stream, gapSeconds = 1800)
        .writeStream
        .outputMode(OutputMode.Append)
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // batch 1: u1 two events 5 min apart, u2 one event — nothing closes
    // (the watermark is still behind every session's gap horizon)
    Seq(
      Incremental.Event(1L, ts(0), "view"),
      Incremental.Event(1L, ts(5), "click"),
      Incremental.Event(2L, ts(1), "view")
    ).toDS().write.mode("append").parquet(in)
    drain()
    assert(!new java.io.File(out).exists() ||
      spark.read.parquet(out).isEmpty)
    // batch 2: u2 reappears 2h later — the watermark jumps to 1h30,
    // closing u1's idle session (2 events) via event-time timeout AND
    // splitting u2's own history in-batch (old session of 1 closes)
    Seq(Incremental.Event(2L, ts(120), "view"))
      .toDS().write.mode("append").parquet(in)
    drain()
    val sessions = spark.read.parquet(out).as[Incremental.SessionUpdate]
      .collect().map(su => su.user_id -> su.n_events).toMap
    assert(sessions == Map(1L -> 2L, 2L -> 1L), sessions.toString)
  }

  test("sessionization merges LATE within-watermark events without splitting") {
    val in = tmp(); val cp = tmp(); val out = tmp()
    def ts(min: Int) = new java.sql.Timestamp(3600L * 1000 * 24 + min * 60000L)
    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema).parquet(in)
        .as[Incremental.Event]
      val q = Incremental.sessionize(stream, gapSeconds = 1800)
        .writeStream.outputMode(OutputMode.Append)
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // drain 1: u1 at t=100 -> state (1, 100); watermark advances to 70
    Seq(Incremental.Event(1L, ts(100), "a")).toDS().write.mode("append").parquet(in)
    drain()
    // drain 2: LATE u1 event at t=80 (>= watermark 70, admitted): must
    // merge into the session WITHOUT pulling the gap anchor back to 80
    Seq(Incremental.Event(1L, ts(80), "b")).toDS().write.mode("append").parquet(in)
    drain()
    // drain 3: u1 at t=125 — 25 min after the anchor (100): same session.
    // a regressed anchor (80) would see a 45-min gap and split here.
    Seq(Incremental.Event(1L, ts(125), "c")).toDS().write.mode("append").parquet(in)
    drain()
    // drain 4: an unrelated user far in the future closes u1 by watermark
    Seq(Incremental.Event(2L, ts(400), "d")).toDS().write.mode("append").parquet(in)
    drain()
    val sessions = spark.read.parquet(out).as[Incremental.SessionUpdate]
      .collect().filter(_.user_id == 1L).map(_.n_events).toSeq
    assert(sessions == Seq(3L), sessions.toString)
  }

  test("windowed aggregation DROPS beyond-watermark late data, with exact " +
    "accounting vs the batch twin minus the late set") {
    val in = tmp(); val cp = tmp(); val out = tmp()
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    def ev(min: Int, t: String) = (ts(min), t, 1L)
    def drain(): Unit = {
      val schema = spark.read.parquet(in).schema
      val stream = spark.readStream.schema(schema).parquet(in)
      val q = Incremental.windowedCounts(stream,
        window_ = "1 hour", slide = "1 hour", watermark = "15 minutes")
        .select(col("window.start").as("wstart"), col("event_type"),
          col("n"), col("total_value"))
        .writeStream.outputMode(OutputMode.Append)
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // drain 1: two events in hour 0, one in hour 1, a head event in hour
    // 5 -> watermark lands at 04:45, hours 0 and 1 close and emit
    val batch1 = Seq(ev(10, "x"), ev(20, "x"), ev(90, "y"), ev(300, "x"))
    batch1.toDF("ts", "event_type", "value").write.mode("append").parquet(in)
    drain()
    // drain 2: two LATE events (00:40, 01:45 — both behind the 04:45
    // watermark, in already-closed windows) plus a new head at 07:00
    // that closes hour 5. The late rows must be DROPPED, not merged.
    val late = Seq(ev(40, "x"), ev(105, "y"))
    val batch2 = late :+ ev(420, "x")
    batch2.toDF("ts", "event_type", "value").write.mode("append").parquet(in)
    drain()
    val got = spark.read.parquet(out)
      .select(col("wstart").cast("long"), col("event_type"), col("n"))
      .as[(Long, String, Long)].collect().toSet
    // exact accounting: emitted rows == batch twin over (all - late),
    // restricted to the closed windows (hours 0, 1, 5)
    val kept = (batch1 ++ batch2).diff(late)
    val expected = kept.groupBy(e => (e._1.getTime / 3600000 * 3600, e._2))
      .map { case ((h, t), es) => (h, t, es.size.toLong) }
      .filter(_._1 < 6 * 3600).toSet
    assert(got == expected, s"got $got expected $expected")
    // and the late set really is absent: a batch twin over ALL events
    // disagrees on hour 0 (3 events) vs the stream's emitted 2
    assert(got.contains((0L, "x", 2L)))
    val batchAll = (batch1 ++ batch2)
      .count(e => e._1.getTime < 3600000L && e._2 == "x")
    assert(batchAll == 3)
  }

  test("ops-log daily usage + 24h error summary (A7/A8 on log schema)") {
    val logs = Seq(
      ("2024-01-01 10:00:00", "ERROR", "network", "mutation", "connection timeout", 100L),
      ("2024-01-01 11:00:00", "INFO", "ok", "query", "fine", 10L),
      ("2024-01-02 10:30:00", "ERROR", "auth", "mutation", "permission denied", 50L))
      .toDF("ts_s", "level", "category", "operation", "message", "bytes")
      .withColumn("ts", to_timestamp($"ts_s"))
      .withColumn("submission_name", lit("f1"))
    val daily = OpsLog.dailyUsage(logs).orderBy("day").collect()
    assert(daily.length == 2)
    assert(daily(0).getAs[Long]("total_bytes") == 110L)
    assert(daily(0).getAs[Long]("mutations") == 1L)
    val errs = OpsLog.errorSummary24h(logs).collect()
    // anchored at max ts (01-02 10:30): only the 01-02 error is inside 24h
    assert(errs.map(r => (r.getString(0), r.getLong(1))).toMap == Map("auth" -> 1L))
  }

  test("streaming daily usage + error windows match their batch twins") {
    // the two OpsLog streaming surfaces through the REAL engine:
    // streamingDailyUsage must agree column-for-column with the batch
    // dailyUsage on watermark-closed days (UTC sessions — the engine
    // contract — make the 24h tumbling window exactly the to_date day),
    // and streamingErrorWindows must count per (window, category)
    val dir = tmp(); val cp1 = tmp(); val cp2 = tmp()
    val logs = Seq(
      ("2024-01-01 10:00:00", "ERROR", "network", "mutation", "timeout", 100L),
      ("2024-01-01 11:00:00", "INFO", "ok", "query", "fine", 10L),
      ("2024-01-02 10:30:00", "ERROR", "auth", "mutation", "denied", 50L),
      ("2024-01-03 09:00:00", "INFO", "ok", "query", "fine", 7L))
      .toDF("ts_s", "level", "category", "operation", "message", "bytes")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
      .withColumn("submission_name", lit("f1"))
      .select("ts", "level", "category", "operation", "message",
        "bytes", "submission_name")
    logs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(OpsLog.LogSchema).parquet(dir)

    val q1 = OpsLog.streamingDailyUsage(stream)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("daily_usage")
      .option("checkpointLocation", cp1)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val got = spark.table("daily_usage")
    val batch = OpsLog.dailyUsage(logs)
    // append emits only watermark-closed days; every emitted day must
    // equal its batch twin on EVERY column (same names, same values)
    assert(got.count() > 0 && got.count() <= batch.count())
    assert(got.columns.sorted.toSeq == batch.columns.sorted.toSeq)
    val cols = Seq("total_bytes", "operations", "mutations", "queries",
      "over_80pct_of_5gb")
    val mism = got.as("g").join(batch.as("b"), Seq("day"))
      .where(cols.map(c => col(s"g.$c") =!= col(s"b.$c"))
        .reduce(_ || _))
    assert(mism.count() == 0, "streaming day must equal its batch twin")

    // full stream in, ERROR-only windows out: the INFO rows (including
    // the LAST event, 01-03) still advance the watermark — that is what
    // closes the 01-02 window — but emit no rows (zero-error groups are
    // filtered post-aggregation; a row-level ERROR filter would be
    // pushed below the watermark node and stall the close); categories
    // come from the message classifier (F15), the batch twin's key
    val q2 = OpsLog.streamingErrorWindows(stream, "24 hours", "1 hour")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("err_windows")
      .option("checkpointLocation", cp2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val errs = spark.table("err_windows")
      .select(to_date($"window.start").as("day"), $"category", $"n")
      .collect().map(r => (r.getDate(0).toString, r.getString(1),
        r.getLong(2))).toSet
    // the 01-03 window may be open (watermark); the closed ones exact
    assert(errs.contains(("2024-01-01", "network", 1L)))
    assert(errs.contains(("2024-01-02", "auth", 1L)))
    // non-error traffic: watermark fuel only, never a window row
    assert(!errs.exists(_._2 == "ok"), errs.toString)
  }

  test("state shuffle width = f(keyspace); results are width-invariant") {
    // the sizing math: ceil-divide, clamped to [1, maxPartitions]
    assert(Incremental.partitionsForKeys(0) == 1)
    assert(Incremental.partitionsForKeys(500) == 1)
    assert(Incremental.partitionsForKeys(65536) == 1)
    assert(Incremental.partitionsForKeys(65537) == 2)
    assert(Incremental.partitionsForKeys(10L * 65536) == 10)
    assert(Incremental.partitionsForKeys(Long.MaxValue / 2) == 2048)
    assert(Incremental.partitionsForKeys(1 << 20, keysPerPartition = 4096,
      maxPartitions = 64) == 64)
    intercept[IllegalArgumentException](Incremental.partitionsForKeys(-1))
    intercept[IllegalArgumentException](
      Incremental.partitionsForKeys(1, keysPerPartition = 0))
    // the override conf wins over the computed width
    spark.conf.set(Incremental.StatePartitionsOverrideConf, "5")
    try assert(Incremental.statePartitions(spark, 1L << 40) == 5)
    finally spark.conf.unset(Incremental.StatePartitionsOverrideConf)
    assert(Incremental.statePartitions(spark, 1L << 40) ==
      Incremental.partitionsForKeys(1L << 40))
    // REAL-engine invariance: the q44 drain at the computed width (1 for
    // the fixture keyspace) and at an overridden width ≠ 8 must be
    // row-identical — state hash-partitioning never leaks into results
    val q44 = graft.SparkEntry.queries("q44_streaming_window")
    val base = q44(spark, graft.SparkTestSession.sfDir)
      .collect().map(_.toString).toSeq
    assert(base.nonEmpty)
    spark.conf.set(Incremental.StatePartitionsOverrideConf, "5")
    try {
      val alt = q44(spark, graft.SparkTestSession.sfDir)
        .collect().map(_.toString).toSeq
      assert(alt == base, "q44 results must not depend on the state width")
    } finally spark.conf.unset(Incremental.StatePartitionsOverrideConf)
  }

  test("corpusGate with a standing corpus drops held docs via stream-static joins") {
    val in = tmp(); val cp = tmp(); val out = tmp()
    // the md5 band contract fixtures from DedupMergeSpec: 'edge' swaps
    // for 'bank' and still collides on band 0 at J = 833
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val near = "the quick brown fox jumps over the lazy dog near the river edge"
    val standing = Seq(
      (100L, "en", base),
      (101L, "en", "entirely unrelated corpus material about astronomy telescopes"))
      .toDF("doc_id", "lang", "text")
    val batch1 = Seq(
      (1L, "en", base),                                  // exact dup of 100
      (2L, "en", near),                                  // near dup of 100
      (3L, "en", "completely novel subject matter nothing shared at all"),
      (4L, "en", "completely novel subject matter nothing shared at all"))
      .toDF("doc_id", "lang", "text")                    // in-stream dup of 3
    batch1.write.mode("append").parquet(in)
    def drain(): Unit = Incremental.corpusGate(
      spark, in, batch1.schema, cp, out,
      againstCorpus = Some(standing), expectedKeys = 1000L)
    drain()
    def kept(): Set[Long] = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(kept() == Set(3L), s"got ${kept()}")
    // re-submitting a corpus-held text drops on the REMEMBERED state
    // path; a new novel doc still lands
    Seq((5L, "en", base), (6L, "en", "another genuinely fresh document body"))
      .toDF("doc_id", "lang", "text").write.mode("append").parquet(in)
    drain()
    assert(kept() == Set(3L, 6L), s"got ${kept()}")
    // the survivor set equals the batch operator's `new` verdicts on
    // first-seen stream docs (ids 1,2,3,5,6 with 4 deduped in-stream)
    val firstSeen = Seq((1L, base), (2L, near),
      (3L, "completely novel subject matter nothing shared at all"),
      (6L, "another genuinely fresh document body")).toDF("doc_id", "text")
    val twin = graft.operators.Dedup.dedupAgainst(
        firstSeen, standing, "text", "doc_id",
        maxCandidates = Int.MaxValue)
      .where(col("verdict") === "new").select("doc_id")
      .as[Long].collect().toSet
    assert(kept() == twin, "streaming gate must equal the q109 batch twin")
  }

  test("corpusGate accounts for the band-bucket cap when it binds") {
    val in = tmp(); val cp = tmp(); val out = tmp()
    val txt = "the quick brown fox jumps over the lazy dog near the river bank"
    // four corpus docs with IDENTICAL text: both band buckets hold 4
    // rows, so cap=2 truncates two rows in each — exactly the
    // degenerate-bucket shape the cap exists for
    val standing = (100L to 103L).map(i => (i, "en", txt))
      .toDF("doc_id", "lang", "text")
    val batch = Seq(
      (1L, "en", txt), // exact dup: drops on the content-key path, cap-blind
      (2L, "en", "completely novel subject matter nothing shared at all"))
      .toDF("doc_id", "lang", "text")
    batch.write.mode("append").parquet(in)
    val r = Incremental.corpusGate(spark, in, batch.schema, cp, out,
      againstCorpus = Some(standing), expectedKeys = 100L,
      againstBucketCap = 2)
    assert(r == Incremental.CorpusGateReport(
      cappedBuckets = 2L, droppedIndexRows = 4L))
    // gate semantics under a binding cap: the exact path is unaffected
    // (content-key probe, not the band index), novel docs still land
    val kept = spark.read.parquet(out)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"got $kept")
    // same corpus at the default cap: every bucket fits -> zero/zero,
    // i.e. this drain's candidate generation was exhaustive
    val in2 = tmp(); val cp2 = tmp(); val out2 = tmp()
    batch.write.mode("append").parquet(in2)
    assert(Incremental.corpusGate(spark, in2, batch.schema, cp2, out2,
      againstCorpus = Some(standing), expectedKeys = 100L)
      == Incremental.CorpusGateReport(0L, 0L))
    // no standing corpus: no band index, trivially zero/zero
    val in3 = tmp(); val cp3 = tmp(); val out3 = tmp()
    batch.write.mode("append").parquet(in3)
    assert(Incremental.corpusGate(spark, in3, batch.schema, cp3, out3,
      expectedKeys = 100L) == Incremental.CorpusGateReport(0L, 0L))
  }

  test("corpusGate drains crawl batches into a clean deduped store, batch-equivalently") {
    val in = tmp(); val cp = tmp(); val out = tmp()
    // 60-word docs built to pass the Gopher A1.1 conjunction (mean word
    // length ~4.1, alpha 1000 mills, stop words present); short docs and
    // control-char-only docs exercise the reject branches
    def longDoc(seed: Int) =
      Seq.fill(12)(s"the quick brown fox v$seed jumps over lazy dogs")
        .mkString(" ") + " contact user7@example.com"
    val stops = Seq("the", "over")
    val batch1 = Seq(
      (1L, "en", longDoc(1)),
      (2L, "en", longDoc(1)),       // exact dup of 1 after cleaning
      (3L, "de", longDoc(3)),
      (4L, "en", "too short"),      // fails the word-count rule
      (5L, "en", "​"))   // cleans to empty: dropped pre-gate
      .toDF("doc_id", "lang", "text")
    batch1.write.mode("append").parquet(in)
    val schema = batch1.schema
    def drain(): Unit = Incremental.corpusGate(
      spark, in, schema, cp, out, gopherStops = Some(stops),
      expectedKeys = 1000L)
    drain()
    def kept(): Map[Long, String] = spark.read.parquet(out)
      .select("doc_id", "content_key").as[(Long, String)].collect().toMap
    assert(kept().keySet == Set(1L, 3L), s"got ${kept().keySet}")
    // batch 2: cross-batch dup of doc 1, PII-variant dup of doc 3
    // (emails scrub to the same mask -> same content key), one novel doc
    Seq(
      (6L, "en", longDoc(1)),
      (7L, "de", longDoc(3).replace("user7@example.com", "other9@example.net")),
      (8L, "es", longDoc(8)))
      .toDF("doc_id", "lang", "text").write.mode("append").parquet(in)
    drain()
    assert(kept().keySet == Set(1L, 3L, 8L),
      "cross-batch and PII-variant duplicates must be suppressed by state")
    // idempotent: nothing new -> nothing appended
    drain()
    assert(kept().keySet == Set(1L, 3L, 8L))
    // the store equals the BATCH twin of the same per-doc stages
    // (ids increase across batches, so first-seen == min-id)
    import graft.functions.{TextFunctions, UnicodeNorm}
    val all = spark.read.parquet(in)
    val cleanedB = all
      .withColumn("text",
        TextFunctions.scrubPii(UnicodeNorm.cleanText(col("text"))))
      .where(TextFunctions.tokenCount(col("text")) > 0)
    val ruledB = graft.operators.TextAnalysis.gopherQualityFlags(
        cleanedB.withColumn("__text", col("text")), "text", "doc_id", stops,
        keepColumns = Seq("__text"))
      .where(col("gopher_ok"))
      .select(col("doc_id"), col("__text").as("text"))
    // contentKey (md5 of lower/trim) — the SAME key Dedup.exact/q29 and
    // the gate use, so the store is directly comparable to a batch cut
    val twin = ruledB
      .withColumn("content_key", TextFunctions.contentKey(col("text")))
      .groupBy("content_key").agg(min("doc_id").as("doc_id"))
      .select("doc_id", "content_key").as[(Long, String)].collect().toMap
    assert(kept() == twin, "streaming store must equal the batch twin")
  }

  test("streaming heavy hitters carry shard summaries across drains; exact after recount") {
    val in = tmp(); val cp = tmp(); val out = tmp()
    val counters = 8
    def drain(): Unit = {
      val stream = spark.readStream
        .schema(new org.apache.spark.sql.types.StructType()
          .add("value", org.apache.spark.sql.types.StringType))
        .parquet(in).as[String]
      val q = Incremental.streamingHeavyHitters(stream, counters, nShards = 2)
        .writeStream.outputMode(OutputMode.Append)
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val b1 = Seq.fill(30)("alpha") ++ Seq.fill(20)("beta") ++
      (1 to 15).map(i => s"rare$i")
    b1.toDF("value").write.mode("append").parquet(in)
    drain()
    val b2 = Seq.fill(25)("alpha") ++ Seq.fill(10)("gamma") ++
      (16 to 30).map(i => s"rare$i")
    b2.toDF("value").write.mode("append").parquet(in)
    drain()
    val emitted = spark.read.parquet(out).as[Incremental.HhSummary].collect()
    // Append mode re-emits summaries: keep each shard's latest version
    val latestV = emitted.groupBy(_.shard).view.mapValues(_.map(_.version).max).toMap
    val latest = emitted.filter(r => r.version == latestV(r.shard))
    val all = b1 ++ b2
    // stream position restored across drains: shard totals sum to N
    assert(latest.map(r => r.shard -> r.shard_n).toMap.values.sum == all.size.toLong)
    // bounded state: each shard holds at most `counters` candidates
    latest.groupBy(_.shard).foreach { case (s, rows) =>
      assert(rows.length <= counters, s"shard $s overflow")
    }
    // the q83 superset invariant, carried to shards: every item with
    // global count > N/counters must be a candidate in the LAST summary
    // (its whole count sits in one shard — cross-batch state required:
    // alpha needs both batches to clear the bar this strongly)
    val cands = latest.map(_.item).toSet
    val trueCounts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val guaranteed = trueCounts.filter(_._2 > all.size.toLong / counters).keySet
    assert(guaranteed.subsetOf(cands), s"missing: ${guaranteed -- cands}")
    // pass B (batch recount of candidates) yields the EXACT top-3 —
    // identical to the one-shot batch operator on the union input
    val recount = trueCounts.view.filterKeys(cands).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(3)
      .map { case (t, c) => (t, c) }
    val batch = graft.operators.HeavyHitters
      .topKExact(all.toDS(), k = 3, counters = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(recount == batch, s"recount=$recount batch=$batch")
    // estimates never undercount (Space-Saving overestimates only)
    latest.foreach(r => assert(r.est >= trueCounts.getOrElse(r.item, 0L)))
  }

  test("streaming z-flags match the batch trailingZFlags across drains") {
    val in = tmp(); val cp = tmp(); val out = tmp()
    // the q138 input: per-type daily counts from the events fixture
    val daily = graft.Tables.eventsTsMicros(
        spark.read.parquet(s"${SparkTestSession.sfDir}/events.parquet"))
      .groupBy(col("event_type").as("k"),
        expr("ts_us div 86400000000").as("tick"))
      .agg(count(lit(1)).as("v"))
    val mid = daily.agg(expr("percentile_approx(tick, 0.5)")).head().getLong(0)
    val schema = daily.schema
    def drain(): Unit = {
      val q = Incremental.streamingZFlags(
          spark.readStream.schema(schema).parquet(in)
            .as[Incremental.MetricPoint],
          lookback = 7L, minPoints = 4, zMills = 2000L)
        .writeStream
        .outputMode(OutputMode.Append)
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // two chronological drains: the second batch's baselines REQUIRE
    // state carried from the first (its early ticks look back past the
    // batch boundary)
    daily.where(col("tick") <= mid).write.mode("append").parquet(in)
    drain()
    val afterFirst = spark.read.parquet(out).count()
    daily.where(col("tick") > mid).write.mode("append").parquet(in)
    drain()
    val got = spark.read.parquet(out).as[Incremental.ZFlag].collect()
      .map(z => (z.k, z.tick) -> ((z.v, z.win_n, z.win_sum, z.anomalous)))
      .toMap
    val expect = graft.operators.Rolling.trailingZFlags(
        daily, "k", "tick", "v", lookback = 7L, minPoints = 4,
        zMills = 2000L)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("tick")) ->
        ((r.getAs[Long]("v"), r.getAs[Long]("win_n"),
          r.getAs[Long]("win_sum"), r.getAs[Boolean]("anomalous"))))
      .toMap
    assert(afterFirst > 0 && afterFirst < expect.size.toLong,
      "both drains must contribute rows")
    assert(got == expect,
      "streamed flags must be row-identical to the batch operator")
    // the parity is only meaningful if some flag actually fired
    assert(got.values.exists(_._4), "fixture must flag at least one day")
    assert(got.values.exists(!_._4))
  }

  test("stream-stream attribution join matches the batch range join across drains") {
    val inT = tmp(); val inC = tmp(); val cp = tmp(); val out = tmp()
    val W = 7L * 86400000000L
    val ev = graft.Tables.eventsTsMicros(
      spark.read.parquet(s"${SparkTestSession.sfDir}/events.parquet"))
    val touch = ev.where(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts_us").as("touch_ts"), col("event_type").as("channel"))
    val conv = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("ts_us").as("conv_ts"))
    val mid = ev.agg(expr("percentile_approx(ts_us, 0.5)")).head().getLong(0)
    def drain(): Unit = {
      // 60-day watermark >> the drain's disorder: nothing evicted, so
      // the match set must be EXACTLY the batch join
      val q = Incremental.streamAttributionJoin(
          spark.readStream.schema(touch.schema).parquet(inT),
          spark.readStream.schema(conv.schema).parquet(inC),
          windowUs = W, watermarkDelay = "60 days")
        .writeStream
        .outputMode(OutputMode.Append)
        .format("parquet").option("path", out)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // drain 1: first-half touches + conversions; drain 2 adds the
    // rest — its conversions must still match drain-1 touches held in
    // the join state
    touch.where(col("touch_ts") <= mid).write.mode("append").parquet(inT)
    conv.where(col("conv_ts") <= mid).write.mode("append").parquet(inC)
    drain()
    val afterFirst = spark.read.parquet(out).count()
    touch.where(col("touch_ts") > mid).write.mode("append").parquet(inT)
    conv.where(col("conv_ts") > mid).write.mode("append").parquet(inC)
    drain()
    val got = spark.read.parquet(out)
      .select("conv_id", "touch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = conv.join(touch, Seq("user_id"))
      .where(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - lit(W))
      .select("conv_id", "touch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(afterFirst > 0 && afterFirst < expect.size.toLong,
      "both drains must contribute matches")
    assert(got == expect,
      s"stream join must equal the batch range join " +
        s"(got ${got.size}, expect ${expect.size})")
    // cross-drain joins actually happened: some drain-2 conversion
    // matched a drain-1 touch
    val late = spark.read.parquet(out)
      .where(col("conv_ts") > mid && col("touch_ts") <= mid).count()
    assert(late > 0, "no cross-drain match — state carry untested")
  }

  test("corpusGate crash-recovery: a drain hard-stopped between " +
    "micro-batches on RocksDB resumes exactly-once against the " +
    "appended dedup index") {
    // verdict r12 item 5: restart idempotence was only ever proven on
    // GRACEFUL AvailableNow completion. Here the first drain is KILLED
    // from a listener right after its first micro-batch commits (the
    // stop lands between batches, or mid-batch-1 — either is a valid
    // crash point and both leave batch 1 uncommitted), on the RocksDB
    // state store; a second corpusGate call on the SAME checkpoint
    // must finish the drain with the final store equal to an
    // uninterrupted run's — byte-identical survivors, zero duplicates
    // — even though the standing dedup index was APPENDED between the
    // crash and the resume (the round-12 DedupMergeSpec maintenance
    // loop's streaming twin).
    val RocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    // email-free docs (the gate scrubs stream-side PII, so a corpus
    // doc carrying an email would never key-match its stream twin)
    // with SEED-DISJOINT token sets: two docs of different seeds share
    // zero tokens (Jaccard 0), so "novel" really means novel — no
    // accidental near-dup edges for the 500-mills gate to find
    def doc(seed: Int) =
      Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta").map(w => s"$w$seed").mkString(" ")
    val corpus = Seq((9001L, "en", doc(9001)), (9002L, "en", doc(9002)))
      .toDF("doc_id", "lang", "text")
    // 64 input docs -> 64 files: with the gate's maxFilesPerTrigger=32
    // an AvailableNow drain takes exactly 2 micro-batches. Mix: exact
    // dups of corpus docs (index path), exact dup PAIRS within the
    // input (state path), novel docs with disjoint tokens. NO
    // near-dups of novel input docs — the appended index must not be
    // able to change any verdict, only re-confirm them, or the parity
    // assertion below would be comparing different semantics.
    val input = (0 until 64).map { i =>
      val id = 100L + i
      val text =
        if (i % 8 == 0) doc(9001 + (i % 2)) // exact dup of a corpus doc
        else doc(10000 + i)                 // novel, seed-disjoint
      (id, "en", text)
    } ++ Seq((900L, "en", doc(10001)))      // exact dup of i=1's doc
    val in = tmp()
    input.toDF("doc_id", "lang", "text")
      .repartition(64).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema

    def gate(s: org.apache.spark.sql.SparkSession, cp: String, out: String,
        c: org.apache.spark.sql.DataFrame): Unit =
      Incremental.corpusGate(s, in, schema, cp, out,
        againstCorpus = Some(c))
    def kept(out: String): Set[(Long, String)] =
      spark.read.parquet(out).select("doc_id", "content_key")
        .as[(Long, String)].collect().toSet

    // reference: uninterrupted single drain, same provider
    val refS = spark.newSession()
    refS.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    val refOut = tmp()
    gate(refS, tmp(), refOut, corpus)
    val expect = kept(refOut)
    assert(expect.nonEmpty)

    // interrupted run: a listener stops the query at its FIRST commit.
    // The listener bus is async, so occasionally batch 1 commits before
    // the stop lands — retry with fresh dirs until the kill truncates
    // (observed: first try, practically always).
    var attempt = 0
    var truncated = false
    var cp = ""; var out = ""
    var s: org.apache.spark.sql.SparkSession = null
    while (!truncated && attempt < 4) {
      attempt += 1
      cp = tmp(); out = tmp()
      s = spark.newSession()
      s.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        @volatile private var fired = false
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          if (!fired) {
            fired = true
            s.streams.active.filter(_.id == e.progress.id).foreach(_.stop())
          }
      }
      s.streams.addListener(listener)
      try gate(s, cp, out, corpus)
      finally s.streams.removeListener(listener)
      truncated = kept(out).size < expect.size
    }
    assert(truncated,
      s"the hard stop never truncated a drain in $attempt attempts")
    val partial = kept(out)
    assert(partial.subsetOf(expect),
      s"a killed drain committed rows the full drain would not: " +
        s"${partial -- expect}")

    // maintenance append between crash and resume: the survivors the
    // crashed drain already shipped join the standing index — the
    // steady-state loop's order of events (ship, then index, then the
    // next drain). Resume on the SAME checkpoint against the grown
    // corpus.
    val appended = corpus.unionByName(
      spark.read.parquet(out).select("doc_id", "lang", "text"))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDb)
    gate(s2, cp, out, appended)
    val fin = kept(out)
    assert(fin == expect,
      s"resume diverged: missing=${expect -- fin} extra=${fin -- expect}")
    // exactly-once at the store: no doc shipped twice across the
    // crashed and resumed drains
    val n = spark.read.parquet(out).count()
    assert(n == fin.size.toLong, s"duplicate rows in the store: $n vs ${fin.size}")
  }
}
