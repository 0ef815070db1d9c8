package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("synthetic media table carries binary content + typed metadata") {
    val m = Multimodal.syntheticMediaFromDocs(spark, graft.SparkTestSession.sfDir)
    assert(m.schema("content").dataType.typeName == "binary")
    assert(m.schema("meta").dataType.typeName == "struct")
    assert(m.count() > 0)
  }

  test("feature extraction: partition-wise batched, stable output schema") {
    val m = Multimodal.syntheticMediaFromDocs(spark, graft.SparkTestSession.sfDir)
    val f = Multimodal.extractFeatures(m, dim = 8, batchSize = 16)
    assert(f.columns.toSeq ==
      Seq("media_id", "kind", "n_bytes", "sha_prefix", "features"))
    val rows = f.orderBy("media_id").limit(3).collect()
    assert(rows.forall(_.getAs[Seq[Float]]("features").length == 8))
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(m, dim = 8, batchSize = 4)
      .orderBy("media_id").limit(3).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("extracted features feed similarity search end-to-end") {
    val m = Multimodal.syntheticMediaFromDocs(spark, graft.SparkTestSession.sfDir)
    val f = Multimodal.extractFeatures(m, dim = 8).withColumnRenamed("media_id", "vec_id")
    val knn = SimilaritySearch.bruteForceTopK(
      f.where($"vec_id" < 3), f, "vec_id", "features", k = 2)
    assert(knn.count() == 6) // 3 queries x k=2
  }

  test("frame sampling emits frame references for videos only") {
    val m = Multimodal.syntheticMediaFromDocs(spark, graft.SparkTestSession.sfDir)
    val frames = Multimodal.sampleFrames(m, everyNth = 10)
    assert(frames.count() > 0)
    val kinds = frames.join(m, Seq("media_id")).select("kind").distinct()
      .as[String].collect().toSeq
    assert(kinds == Seq("video"))
  }
}
