package graft.streaming

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** The 100 TB state backend, exercised for real: q44 (watermarked
  * windowed agg) and q71 (flatMapGroupsWithState sessionization) drain
  * through the ACTUAL microbatch engine twice — once on the default
  * in-memory state store and once on RocksDB
  * (`RocksDBStateStoreProvider`, the disk-backed store a production
  * cluster runs when state exceeds executor heap) — and must emit
  * row-identical results. The provider rides the caller session's
  * conf through SparkEntry's isolated stream clone, so this drives the
  * exact production path, not a spec-local twin of it.
  */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Runs `q` once per provider (None = engine default HDFS-backed
    * memory store) on its own session clone and returns the collected,
    * canonically-sorted rows. */
  private def runWith(q: String, provider: Option[String]): Seq[String] = {
    val s = spark.newSession()
    provider.foreach(
      s.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    SparkEntry.queries(q)(s, dir)
      .collect().map(_.mkString("|")).toSeq.sorted
  }

  test("q44 windowed counts are identical on memory and RocksDB state stores") {
    val mem = runWith("q44_streaming_window", None)
    val rocks = runWith("q44_streaming_window", Some(RocksDb))
    assert(mem.nonEmpty, "drain emitted no closed windows")
    assert(rocks == mem)
  }

  test("q71 sessionization state is identical on memory and RocksDB state stores") {
    val mem = runWith("q71_stream_sessions", None)
    val rocks = runWith("q71_stream_sessions", Some(RocksDb))
    assert(mem.nonEmpty, "drain emitted no closed sessions")
    assert(rocks == mem)
  }

  test("corpusGate dedup state is identical on memory and RocksDB state stores") {
    // the incremental corpus gate's first-occurrence state, through the
    // real engine on both providers (expectedKeys > 0 exercises the
    // conf-copying drain clone, the production path)
    import org.apache.spark.sql.functions._
    def run(provider: Option[String]): Seq[(Long, String)] = {
      val s = spark.newSession()
      provider.foreach(
        s.conf.set("spark.sql.streaming.stateStore.providerClass", _))
      import s.implicits._
      val in = java.nio.file.Files.createTempDirectory("rg-in").toString
      val cp = java.nio.file.Files.createTempDirectory("rg-cp").toString
      val out = java.nio.file.Files.createTempDirectory("rg-out").toString
      val docs = Seq(
        (1L, "en", "alpha beta gamma"), (2L, "en", "alpha beta gamma"),
        (3L, "de", "delta epsilon"), (4L, "de", "  delta   epsilon "))
        .toDF("doc_id", "lang", "text")
      docs.write.mode("append").parquet(in)
      Incremental.corpusGate(s, in, docs.schema, cp, out,
        expectedKeys = 100L)
      s.read.parquet(out).select("doc_id", "content_key")
        .as[(Long, String)].collect().toSeq.sorted
    }
    val mem = run(None)
    val rocks = run(Some(RocksDb))
    assert(mem.map(_._1) == Seq(1L, 3L),
      s"whitespace-normalized dups must collapse to first ids: $mem")
    assert(rocks == mem)
  }
}
