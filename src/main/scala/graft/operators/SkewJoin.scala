package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations on hot keys.
  *
  * AQE's skew-join handling (on by default in the session config)
  * splits oversized sort-merge partitions at runtime; these utilities
  * cover the cases AQE can't: broadcast-ineligible skewed equi-joins
  * where one key dominates, and single-hot-key aggregations.
  *
  * Salting is deterministic — the salt derives from a caller-named
  * identity column via `pmod(hash(...))`, never from RNG — so plans
  * stay replayable and results reproducible.
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `keys` with the large side salted into
    * `nSalts` sub-keys and the small side replicated `nSalts` times.
    * Result rows are identical to the plain join; the shuffle spreads
    * each hot key over `nSalts` partitions.
    *
    * `saltFrom` must be a column of `large` with high cardinality (a
    * primary key); it only seeds the deterministic salt. */
  def saltedJoin(
      large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFrom: Column, nSalts: Int = 8): DataFrame = {
    // fail loud, not empty: nSalts <= 0 would make pmod(·, 0) NULL on
    // every large row (non-ANSI) and the salt equi-join match nothing
    require(nSalts >= 1, s"nSalts=$nSalts must be >= 1")
    require(keys.nonEmpty, "saltedJoin needs at least one join key")
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "input already has a __salt column (reserved by saltedJoin)")
    val l = large.withColumn("__salt", pmod(hash(saltFrom), lit(nSalts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    l.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (keys, salt), then final aggregate on keys. `partials` maps each
    * output column to its (partial, final) aggregate pair — e.g.
    * count = (count(*), sum), sum = (sum(x), sum). */
  def twoPhaseAgg(
      df: DataFrame, keys: Seq[String], saltFrom: Column, nSalts: Int)(
      partial: Seq[Column], fin: Seq[Column]): DataFrame = {
    require(nSalts >= 1, s"nSalts=$nSalts must be >= 1")
    require(!df.columns.contains("__salt"),
      "input already has a __salt column (reserved by twoPhaseAgg)")
    df.withColumn("__salt", pmod(hash(saltFrom), lit(nSalts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)
  }
}
