package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val emb = spark.read
    .parquet(s"${SparkTestSession.sfDir}/embeddings.parquet")
  lazy val queries = emb.where($"vec_id" % 20 === 0)

  test("brute force returns exactly k ordered neighbors per query") {
    val out = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
    val counts = out.groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ == 5))
    val firstQ = out.where($"query_id" === 0).orderBy("rank")
      .select("cos_sq_scaled").as[Long].collect()
    assert(firstQ.toSeq == firstQ.sortBy(-_).toSeq) // descending by score
  }

  test("LSH ANN results are a subset of same-bucket brute-force truth") {
    val lsh = SimilaritySearch.lshTopK(queries, emb, "vec_id", "embedding",
      k = 5, nPlanes = 2, dim = 64)
    assert(lsh.count() > 0)
    // every reported neighbor's score must match brute-force's score for
    // that exact pair (the bucketing only prunes candidates, never
    // changes scores)
    val bf = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding",
      k = Int.MaxValue - 1)
    val joined = lsh.as("l").join(bf.as("b"), Seq("query_id", "neighbor_id"))
      .where(col("l.cos_sq_scaled") =!= col("b.cos_sq_scaled"))
    assert(joined.count() == 0)
  }

  test("Rademacher LSH ANN preserves exact pair scores and bucket closure") {
    val lsh = SimilaritySearch.rademacherLshTopK(queries, emb, "vec_id", "embedding",
      k = 5, nPlanes = 4, dim = 64)
    assert(lsh.count() > 0)
    val bf = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding",
      k = Int.MaxValue - 1)
    val mismatched = lsh.as("l").join(bf.as("b"), Seq("query_id", "neighbor_id"))
      .where(col("l.cos_sq_scaled") =!= col("b.cos_sq_scaled"))
    assert(mismatched.count() == 0)
    // the bucket function is pure: a query must never out-rank its own
    // bucket — every rank sequence starts at 1 and is gapless
    val ranks = lsh.groupBy("query_id")
      .agg(min("rank").as("mn"), max("rank").as("mx"), count(lit(1)).as("n"))
      .where(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(ranks.count() == 0)
  }

  test("k-means assigns every vector to an existing cell, deterministically") {
    val a = SimilaritySearch.kmeansAssignments(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    val rows = a.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length == emb.count())
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate assignment")
    val cells = rows.map(_._2).distinct
    assert(cells.length > 1 && cells.length <= 4, s"got ${cells.length} cells")
    val again = SimilaritySearch.kmeansAssignments(emb, "vec_id", "embedding",
      k = 4, iters = 2).collect().map(r => r.getLong(0) -> r.getLong(1))
    // compare as maps: the ASSIGNMENT must be identical; row order out
    // of an unordered plan is incidental
    assert(rows.toMap == again.toMap, "assignment not deterministic")
  }

  test("k-means per-round cost is flat: the source is scanned once at any iters") {
    // accumulator bumps once per partition per SOURCE scan; the
    // checkpointed quantized corpus must absorb every later action
    // (seed collect, per-round centroid collects, final assignment), so
    // a 5-round run reads the source no more often than a 1-round run.
    val acc = spark.sparkContext.longAccumulator("corpus-scans")
    val base = (0L until 200L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 100).toFloat / 100)))
    def instrumented = base.toDF("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .mapPartitions { it => acc.add(1); it }
      .toDF("vec_id", "embedding")
    acc.reset()
    SimilaritySearch.kmeansAssignments(instrumented, "vec_id", "embedding",
      k = 4, iters = 1).count()
    val oneRound = acc.value
    acc.reset()
    SimilaritySearch.kmeansAssignments(instrumented, "vec_id", "embedding",
      k = 4, iters = 5).count()
    val fiveRounds = acc.value
    assert(fiveRounds <= oneRound,
      s"iters=5 scanned the source $fiveRounds partition-reads vs $oneRound at iters=1")
  }

  test("inline centroid path rejects configs past the literal budget") {
    // 120 cells x 701 literals/cell = 84k nodes > the 64k budget: the
    // inline projection must refuse loudly (broadcast-join territory)
    // instead of stalling Catalyst/Janino on a giant expression tree.
    val wide = (0L until 120L).map(i =>
      (i, Array.tabulate(700)(d => ((i + d) % 50).toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilaritySearch.kmeansAssignments(wide, "vec_id", "embedding",
        k = 120, iters = 1).count()
    }
    assert(e.getMessage.contains("inline centroid set"))
  }

  test("IVF ANN probes cells and preserves exact pair scores") {
    val ivf = SimilaritySearch.ivfTopK(queries, emb, "vec_id", "embedding",
      k = 5, nCells = 4)
    assert(ivf.count() > 0)
    val counts = ivf.groupBy("query_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ <= 5))
    // recall sanity on a clustered corpus: the probed cell should give a
    // decent fraction of true top-5 (not a correctness bound — recorded
    // to catch regressions in cell assignment)
    val bf = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
    val hit = ivf.join(bf, Seq("query_id", "neighbor_id"), "left_semi").count()
    assert(hit > 0, "IVF recalled none of the true top-5")
  }

  test("IVF recall is monotone in nProbe and exhaustive probing is exact") {
    val bf = SimilaritySearch.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
    def recall(nProbe: Int): Long =
      SimilaritySearch.ivfTopK(queries, emb, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = nProbe)
        .join(bf, Seq("query_id", "neighbor_id"), "left_semi").count()
    val r1 = recall(1); val r2 = recall(2); val rAll = recall(4)
    // probing more cells can only add candidates: recall never drops
    assert(r1 <= r2 && r2 <= rAll, s"recall not monotone: $r1, $r2, $rAll")
    // probing every cell = scoring the whole corpus = exact top-5
    assert(rAll == bf.count(), s"exhaustive probe missed: $rAll of ${bf.count()}")
  }
}
