package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the synthetic-sf1 replication contract `ScaleStudy.replica`
  * relies on: a token bijection preserves intra-replica near-dup
  * structure EXACTLY and makes replicas mutually invisible, so the
  * studied 10× corpus has linearly-scaled near-dup mass (a real crawl's
  * shape) rather than replication-clique artifacts.
  */
class ScaleStudySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def toy = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (420L, "the quick brown fox jumps over the lazy cat"),
    (840L, "completely unrelated text about spark plans"))
    .toDF("doc_id", "text")
    .withColumn("lang", lit("en"))
    .withColumn("source", lit("s1"))
    .withColumn("n_chars", length(col("text")).cast("long"))

  test("replica preserves intra-replica Jaccard pairs exactly") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      operators.Dedup.jaccardPairs(df, "text", "doc_id", minJaccardMills = 600)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val base = pairs(toy)
    assert(base.nonEmpty, "toy corpus must contain a near-dup pair")
    val off = 3 * ScaleStudy.IdOffset
    val shifted = base.map { case (a, b, j) => (a + off, b + off, j) }
    assert(pairs(ScaleStudy.replica(toy, 3)) == shifted,
      "token bijection must preserve jac_mills and pair set")
  }

  test("replicas are mutually invisible (no cross-replica near-dups)") {
    val both = ScaleStudy.replica(toy, 0).unionByName(ScaleStudy.replica(toy, 1))
    val cross = operators.Dedup
      .jaccardPairs(both, "text", "doc_id", minJaccardMills = 100)
      .where(col("id_b") >= ScaleStudy.IdOffset && col("id_a") < ScaleStudy.IdOffset)
    assert(cross.count() == 0, "salted replicas must share no shingles")
  }

  test("doc_id residues survive the remap (sample filters stay 10x)") {
    // every modulus used by a gated query's doc_id sample filter
    Seq(3, 4, 5, 7, 21).foreach { m =>
      assert(ScaleStudy.IdOffset % m == 0,
        s"IdOffset must preserve doc_id % $m residues")
    }
  }

  test("synthesize rejects sources that would break the replication contract") {
    val out = java.nio.file.Files.createTempDirectory("graft-synth").toString
    try {
      val tagged = toy.withColumn("text",
        concat(col("text"), lit(" leftover_r3")))
      val e1 = intercept[IllegalArgumentException] {
        val dir = s"$out/tagged"
        tagged.write.mode("overwrite").parquet(s"$dir/documents.parquet")
        ScaleStudy.synthesize(spark, dir, s"$out/o1")
      }
      assert(e1.getMessage.contains("replica-tagged"))
      val bigId = toy.withColumn("doc_id", col("doc_id") + ScaleStudy.IdOffset)
      val e2 = intercept[IllegalArgumentException] {
        val dir = s"$out/bigid"
        bigId.write.mode("overwrite").parquet(s"$dir/documents.parquet")
        ScaleStudy.synthesize(spark, dir, s"$out/o2")
      }
      assert(e2.getMessage.contains("collide"))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("replica keeps schema and recomputes n_chars") {
    val r = ScaleStudy.replica(toy, 2)
    assert(r.columns.toSeq == toy.columns.toSeq)
    val row = r.where(col("doc_id") === 2 * ScaleStudy.IdOffset).head()
    assert(row.getAs[String]("text").endsWith("_r2"))
    assert(row.getAs[Long]("n_chars") == row.getAs[String]("text").length)
  }

  private def toyEvents = Seq(
    (1L, 1000L, 10L, "click", 1.5, "{}"),
    (2L, 2000L, 10L, "purchase", 9.9, "{}"),
    (3L, 1500L, 11L, "click", 0.5, "{}"))
    .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("eventsReplica strides ids into disjoint spaces, copies time structure verbatim") {
    assert(ScaleStudy.eventsReplica(toyEvents, 0).collect().toSeq ==
      toyEvents.collect().toSeq, "k=0 must be the identity")
    val r = ScaleStudy.eventsReplica(toyEvents, 3)
    assert(r.columns.toSeq == toyEvents.columns.toSeq, "column order preserved")
    val rows = r.orderBy("event_id").collect()
    // ids strided; ts/type/value/props bit-identical — per-user session,
    // as-of and SCD2 structure is therefore an exact copy per replica
    assert(rows.map(_.getLong(0)).toSeq ==
      Seq(1L, 2L, 3L).map(_ + 3 * ScaleStudy.EventOffset))
    assert(rows.map(_.getLong(2)).toSeq ==
      Seq(10L, 10L, 11L).map(_ + 3 * ScaleStudy.UserOffset))
    assert(rows.map(r => (r.getLong(1), r.getString(3), r.getDouble(4))).toSeq ==
      Seq((1000L, "click", 1.5), (2000L, "purchase", 9.9), (1500L, "click", 0.5)))
    // replica user spaces are disjoint (stride dominates the id range)
    val u0 = toyEvents.select("user_id").collect().map(_.getLong(0)).toSet
    val u3 = rows.map(_.getLong(2)).toSet
    assert(u0.intersect(u3).isEmpty)
  }

  test("lineitemReplica strides only the order key; dim keys join the same rows") {
    val li = Seq((1L, 100L, 200L, 5.0), (2L, 101L, 201L, 6.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    assert(ScaleStudy.lineitemReplica(li, 0).collect().toSeq == li.collect().toSeq)
    val r = ScaleStudy.lineitemReplica(li, 2).orderBy("l_orderkey").collect()
    assert(r.map(_.getLong(0)).toSeq ==
      Seq(1L, 2L).map(_ + 2 * ScaleStudy.OrderOffset))
    assert(r.map(x => (x.getLong(1), x.getLong(2), x.getDouble(3))).toSeq ==
      Seq((100L, 200L, 5.0), (101L, 201L, 6.0)))
  }

  test("ordersReplica strides only o_orderkey; customer histories stack on the same dim") {
    val ord = Seq((1L, 30L, "F", 10.5), (2L, 31L, "O", 20.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    assert(ScaleStudy.ordersReplica(ord, 0).collect().toSeq == ord.collect().toSeq)
    val r = ScaleStudy.ordersReplica(ord, 2).orderBy("o_orderkey").collect()
    assert(r.map(_.getLong(0)).toSeq ==
      Seq(1L, 2L).map(_ + 2 * ScaleStudy.OrderOffset))
    // o_custkey untouched: the replica's orders land on the SAME customers
    assert(r.map(x => (x.getLong(1), x.getString(2), x.getDouble(3))).toSeq ==
      Seq((30L, "F", 10.5), (31L, "O", 20.0)))
    // replica order-key spaces are disjoint from the source's
    val k0 = ord.select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(k0.intersect(r.map(_.getLong(0)).toSet).isEmpty)
  }

  test("annRecallAtScale scores every gated method against the brute " +
    "chain and carries the published floors") {
    // the sf0.001 fixture is the cheapest corpus both the chains and
    // the helper run on end-to-end; the pin is structural (all four
    // methods present, mills in-range, floors = the ONE published
    // constant, meets_floor consistent) — the 10×-corpus semantics are
    // the study's job, the helper's arithmetic is this spec's
    val json = ScaleStudy.annRecallAtScale(spark, SparkTestSession.sfDir,
      ScaleStudy.annStudies(SparkTestSession.sfDir))
    Seq("lsh", "ivf", "pq", "ivfpq").foreach { m =>
      val re = (s""""$m":\\{"mills":(-?\\d+),"floor":(\\d+),""" +
        s""""meets_floor":(true|false)\\}""").r
      val hit = re.findFirstMatchIn(json)
      assert(hit.isDefined, s"method $m missing from $json")
      val (mills, floor, meets) = (hit.get.group(1).toLong,
        hit.get.group(2).toLong, hit.get.group(3).toBoolean)
      assert(mills >= -1 && mills <= 1000, s"$m mills out of range: $mills")
      assert(floor == SparkEntry.AnnRecallFloorMills(m),
        s"$m floor drifted from the published constant")
      assert(meets == (mills >= floor), s"$m meets_floor inconsistent")
    }
    assert(json.contains("\"recall_ok\":"))
  }
}
