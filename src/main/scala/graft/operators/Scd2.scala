package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension type 2) history build from a change
  * log: per key, collapse consecutive rows with identical tracked
  * attributes into versions, each with `valid_from` (first row's ts),
  * `valid_to` (the NEXT version's `valid_from`; null while current —
  * half-open intervals), `version_no` (1-based), `n_rows` (rows
  * collapsed), and `is_current` (structurally the key's LAST version —
  * null `tsCol` values sort first and can make an interior version's
  * `valid_from`/the predecessor's `valid_to` null, so nullness of
  * `valid_to` is not what marks currency). The warehouse twin of the reference's
  * upsert MERGE sink (app/etl.py snapshot reconcile): MERGE keeps the
  * latest state, SCD2 keeps every state with its validity interval.
  *
  * Shape: ONE shuffle, on `keys`. The change-detection lag window, the
  * per-version collapse (groupBy keys :+ version — clustering satisfied
  * by the keys partitioning), and the `valid_to` lead window all reuse
  * that single exchange; the two windows pay only their in-partition
  * sorts. A hot key concentrates its own history, nothing else —
  * exactly the windowed-rollup cost model, which holds at any scale.
  *
  * Determinism: row order within a key is (`tsCol`, `tieCols`) — pass
  * a unique tie-breaker when timestamps can collide. Attribute change
  * is null-safe (`<=>`), so a null→value or value→null transition opens
  * a version, and attributes are constant (including nullness) within
  * one. `valid_to` is ordered by `version_no`, not `valid_from`, so
  * same-timestamp version boundaries stay deterministic (a version can
  * then be empty: valid_to == valid_from).
  */
object Scd2 {

  /** @param df      change log (one row per observation)
    * @param keys    dimension key columns
    * @param attrs   tracked attribute columns — any change (null-safe)
    *                opens a new version
    * @param tsCol   observation time column (any orderable type)
    * @param tieCols within-ts deterministic tie-breakers (e.g. a
    *                unique event id); strongly recommended
    */
  def buildHistory(df: DataFrame, keys: Seq[String], attrs: Seq[String],
      tsCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "at least one key column is required")
    require(attrs.nonEmpty, "at least one tracked attribute is required")
    val reserved = Seq("__chg", "__ver", "valid_from", "valid_to",
      "version_no", "n_rows", "is_current")
    require(!df.columns.exists(reserved.contains),
      s"input columns may not use the reserved names $reserved")
    val keyCols = keys.map(col)
    val ord = (col(tsCol).asc +: tieCols.map(col(_).asc))
    val w = Window.partitionBy(keyCols: _*).orderBy(ord: _*)
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    // the first row per key must open version 1 unconditionally: when
    // its attrs are all null, null <=> lag(=null) is TRUE and the
    // change predicate alone would leave it versionless (a 0-based
    // history) — detect it structurally, not through the attrs
    val firstRow = lag(lit(1), 1).over(w).isNull
    val versioned = df
      .withColumn("__chg", when(firstRow || changed, 1L).otherwise(0L))
      .withColumn("__ver", sum(col("__chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // attrs are constant within a version (change is null-safe), so
    // min() reconstructs them; all-null stays null (min ignores nothing
    // it could keep)
    // valid_from = the FIRST row's ts under the version order (ts asc
    // NULLS FIRST + tieCols): a version containing any null-ts row
    // opened on that null-ts row, so its valid_from is null — a bare
    // min() would skip the null and silently exclude the null-ts
    // observation from the version's interval.
    val collapsed = versioned
      .groupBy((keyCols :+ col("__ver")): _*)
      .agg(when(count(col(tsCol)) < count(lit(1)), lit(null))
          .otherwise(min(col(tsCol))).as("valid_from"),
        (attrs.map(a => min(col(a)).as(a)) :+
          count(lit(1)).as("n_rows")): _*)
    val wv = Window.partitionBy(keyCols: _*).orderBy(col("__ver").asc)
    // is_current is STRUCTURAL (the key's last version), not
    // valid_to.isNull: a null tsCol makes the next version's
    // valid_from — and so this version's valid_to — null without this
    // being the current version, and two "current" versions per key
    // would break the SCD2 invariant
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .withColumn("is_current", lead(lit(1), 1).over(wv).isNull)
      .select((keyCols :+ col("__ver").as("version_no")) ++
        attrs.map(col) ++ Seq(col("valid_from"), col("valid_to"),
          col("is_current"), col("n_rows")): _*)
  }
}
