package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column functions for similarity search and
  * embedding-based near-dup detection over `Array[Float]` columns.
  *
  * Two families:
  *  - float/double math (`dot`, `cosine`) for production ranking — pure
  *    higher-order-function expression trees, executed inside codegen;
  *  - quantized integer math (`quantize`, `dotQ`) used by the oracle
  *    harness: floor-scaling each component to a bigint makes every
  *    downstream sum/product exact, so Spark and any ANSI engine agree
  *    bit-for-bit (IEEE double accumulation order would otherwise differ).
  *
  * At 100 TB scale the brute-force variants are the verification
  * baseline; `graft.operators.SimilaritySearch` adds the LSH/IVF-blocked
  * scale path on top of these kernels.
  */
object VectorFunctions {

  /** Sequential-order dot product of two numeric arrays (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm (double). */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity in double math. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Quantize a float array to bigints: floor(x * scale). */
  def quantize(a: Column, scale: Int = 1000): Column =
    transform(a, x => floor(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized (bigint) arrays. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Exact integer squared norm of a quantized array. */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Deterministic scaled cosine over quantized vectors:
    * floor(1e6 * dotQ^2 * sign / (|a|^2 * |b|^2)) — all-integer inputs to
    * one IEEE divide + floor, identical across engines. Preserves cosine
    * ordering (squares, sign-corrected). */
  def cosineSqScaledQ(a: Column, b: Column): Column = {
    val d = dotQ(a, b)
    val den = normSqQ(a) * normSqQ(b)
    when(den === 0, lit(0L)).otherwise(
      floor(lit(1000000L) * signum(d) * d * d / den).cast("long"))
  }

  /** LSH bucket id for cosine: sign bits of `planes.size` random-plane
    * projections, packed into a bigint. Planes are caller-provided
    * deterministic vectors (broadcast-sized). */
  def signLshBucket(a: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = aggregate(
        zip_with(a, typedLit(p), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
