package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus diff — the ops surface of an incremental
  * curation pipeline: given two versions of a document store, classify
  * every id as added / removed / changed / unchanged by normalized
  * content key (the q29 exact-dedup key, so cosmetic whitespace/case
  * drift does NOT read as a change). The per-status counts are what a
  * 100 TB nightly run reports before promoting a snapshot; the per-id
  * frame feeds downstream incremental work (only `added`+`changed` ids
  * need re-scoring/re-embedding — see `Dedup.dedupAgainst` for the
  * content-level companion).
  *
  * Scale shape: ONE full-outer equi-join on the id (both sides shuffle
  * on the key once — unavoidable for an id-level diff) with the content
  * key computed scan-side; no content ever crosses the wire, only
  * 32-char keys. Skew-free by construction (ids are unique per side).
  */
object CorpusDiff {

  /** Per-id diff frame: (idCol, status, old_key, new_key) with ''
    * sentinels for absent sides (hash-harness NULL discipline).
    * `status` ∈ added | removed | changed | unchanged. */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // side presence is an explicit marker, never key nullability:
    // contentKey(NULL text) is NULL, and a null-text doc present on one
    // side must still read as present (else it misclassifies as
    // added/removed). Matches the oracle's `o.doc_id IS NULL` semantics.
    val o = oldSnap.select(col(idCol),
      TextFunctions.contentKey(col(textCol)).as("old_key"),
      lit(true).as("__old_present"))
    val n = newSnap.select(col(idCol),
      TextFunctions.contentKey(col(textCol)).as("new_key"),
      lit(true).as("__new_present"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("__old_present").isNull, lit("added"))
          .when(col("__new_present").isNull, lit("removed"))
          .when(col("old_key") <=> col("new_key"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(col(idCol), col("status"),
        coalesce(col("old_key"), lit("")).as("old_key"),
        coalesce(col("new_key"), lit("")).as("new_key"))
  }

  /** Bounded rollup of [[diff]]: one row per status. */
  def diffSummary(d: DataFrame): DataFrame =
    d.groupBy("status").agg(count(lit(1)).as("n"))
}
