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
        val h = scala.util.hashing.MurmurHash3.caseClassHash((p, d))
        (h.toDouble / Int.MaxValue)
      }
    }

  /** The first `k` every-stride(=max(N/k,1)) rows by id, as centroid
    * seeds — deterministic (no RNG), computed fully inside the plan (no
    * separate count action), and a rank PREDICATE rather than a limit:
    * row-order after a filter is engine-defined, rank is not. Shared by
    * the IVF quantizer and k-means init so the two cannot drift. */
  private def stridedCentroids(
      c: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    c.withColumn("__rn", row_number().over(Window.orderBy(col(idCol))))
      .withColumn("__stride",
        greatest(count(lit(1)).over(Window.partitionBy()) / k, lit(1))
          .cast("long"))
      .where((col("__rn") - 1) % col("__stride") === 0
        && col("__rn") <= (col("__stride") * (k - 1)) + 1)
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))

  /** Argmax-cosine cell assignment against a broadcast centroid set
    * (ties to the lowest cell id); keeps the `probes` best cells. */
  private def assignCells(df: DataFrame, vec: String, cents: DataFrame,
      outCol: String, probes: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(cents))
      .withColumn("__sim", VectorFunctions.cosineSqScaledQ(col(vec), col("centroid")))
    val w = Window.partitionBy(df.columns.toIndexedSeq.map(col): _*)
      .orderBy(col("__sim").desc, col("cell_id"))
    scored.withColumn("__r", row_number().over(w))
      .where(col("__r") <= probes)
      .withColumn(outCol, col("cell_id"))
      .drop("cell_id", "centroid", "__sim", "__r")
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nCells` centroids
    * partitions the corpus; queries probe only their nearest cell(s).
    *
    * Centroid selection is deterministic (strided seed via
    * `stridedCentroids`); `kmeansAssignments` runs Lloyd iterations
    * over the same DataFrame shape to train better centroids. Corpus
    * assignment is one crossJoin with the broadcast centroid set (k
    * small) + argmax — the reusable "index build" shuffle; each query
    * then touches ~N/nCells corpus rows instead of N. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nCells: Int = 16,
      nProbe: Int = 1): DataFrame = {
    require(nCells > 0 && nProbe > 0, s"nCells=$nCells, nProbe=$nProbe must be positive")
    val q = queries.select(col(idCol).as("query_id"),
      VectorFunctions.quantize(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      VectorFunctions.quantize(col(vecCol)).as("cv"))
    val cents = stridedCentroids(c, "neighbor_id", "cv", nCells)

    val cAssigned = assignCells(c, "cv", cents, "cell", probes = 1)
    val qAssigned = assignCells(q, "qv", cents, "cell", probes = nProbe)
    val scored = cAssigned.join(broadcast(qAssigned), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sq_scaled", VectorFunctions.cosineSqScaledQ(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sq_scaled").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sq_scaled", "rank")
  }

  /** Deterministic distributed k-means over quantized vectors — the
    * Lloyd iterations the IVF coarse quantizer's doc promises: strided
    * init (no RNG), integer-cosine assignment (argmax, ties to the
    * lowest cell id), centroids recomputed as element-wise
    * floor-averaged integers — every step exact, so any engine
    * reproduces the identical assignment. Per iteration: one broadcast
    * of k centroids + one shuffle on (cell, dim); the corpus itself
    * never reshuffles. Returns (vec_id, cell) after `iters`
    * assignment rounds (centroids update between rounds). */
  def kmeansAssignments(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 2): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(iters > 0, s"iters=$iters must be positive")
    // each round rescans the (columnar, codegen'd) quantize lineage; a
    // long-lived production index build would persist `c` across rounds.
    val c = corpus.select(col(idCol).as("vec_id"),
      VectorFunctions.quantize(col(vecCol)).as("q"))
    var cents = stridedCentroids(c, "vec_id", "q", k)
    var assigned: DataFrame = null
    for (i <- 1 to iters) {
      assigned = assignCells(c, "q", cents, "cell", probes = 1)
      if (i < iters) cents = assigned
        .select(col("cell"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(floor(sum(col("v")) / count(lit(1))).cast("long").as("m"))
        .groupBy("cell")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("centroid"))
        .select(col("cell").as("cell_id"), col("centroid"))
        // k tiny rows; eager checkpoint keeps the per-round lineage flat
        // instead of nesting every previous round's plan
        .localCheckpoint(true)
    }
    assigned.select("vec_id", "cell")
  }

  /** LSH-bucketed ANN over QUANTIZED vectors with Rademacher (±1)
    * md5-parity planes — the oracle-replicable scale path: bucketing and
    * scoring are exact integer math, so any md5-capable engine produces
    * the identical candidate set and ranking. Same output shape as
    * bruteForceTopK; recall < 1 by construction. */
  def rademacherLshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val q = queries.select(
      col(idCol).as("query_id"),
      VectorFunctions.quantize(col(vecCol)).as("qv"))
      .withColumn("bucket", VectorFunctions.rademacherLshBucket(col("qv"), nPlanes, dim))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      VectorFunctions.quantize(col(vecCol)).as("cv"))
      .withColumn("bucket", VectorFunctions.rademacherLshBucket(col("cv"), nPlanes, dim))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos_sq_scaled", VectorFunctions.cosineSqScaledQ(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sq_scaled").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos_sq_scaled", "rank")
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
