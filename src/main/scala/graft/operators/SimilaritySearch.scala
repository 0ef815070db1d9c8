package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, score
  * every corpus row, window top-k per query) — exact, one pass over the
  * corpus, no corpus shuffle; this is the recall oracle.
  *
  * Scale path: sign-LSH bucketing (random-hyperplane bits) — corpus is
  * pre-bucketed (one shuffle, reusable across queries), queries probe
  * only their own bucket (and optionally Hamming-1 neighbors), so the
  * per-query cost drops from O(N) to O(N / 2^bits) at a measured recall
  * trade-off. An IVF variant can swap the bucketer for k-means cells
  * without changing the probe/join shape.
  */
object SimilaritySearch {

  /** Brute-force top-k by quantized cosine (deterministic, exact-int
    * ranking; ties broken by corpus id). queries/corpus: (idCol, vecCol). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"), VectorFunctions.quantize(col(vecCol)).as("qv"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"), VectorFunctions.quantize(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sq_scaled", VectorFunctions.cosineSqScaledQ(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sq_scaled").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sq_scaled", "rank")
  }

  /** Deterministic pseudo-random hyperplanes (no RNG: hash-derived). */
  def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      (0 until dim).map { d =>
        // deterministic hash -> [-1, 1)
        val h = scala.util.hashing.MurmurHash3.productHash((p, d))
        (h.toDouble / Int.MaxValue)
      }
    }

  /** LSH-bucketed ANN: probe only the query's bucket. Same output shape
    * as bruteForceTopK; recall < 1 by construction (the scale path). */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val q = queries.select(
      col(idCol).as("query_id"),
      VectorFunctions.quantize(col(vecCol)).as("qv"),
      VectorFunctions.signLshBucket(col(vecCol), planes).as("bucket"))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      VectorFunctions.quantize(col(vecCol)).as("cv"),
      VectorFunctions.signLshBucket(col(vecCol), planes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sq_scaled", VectorFunctions.cosineSqScaledQ(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sq_scaled").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sq_scaled", "rank")
  }
}
