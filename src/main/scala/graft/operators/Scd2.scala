package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD2 (slowly-changing-dimension type 2) history build from a change
  * log: per key, collapse consecutive rows with identical tracked
  * attributes into versions, each with `valid_from` (first row's ts),
  * `valid_to` (the NEXT version's `valid_from`; null while current —
  * half-open intervals), `version_no` (1-based), `n_rows` (rows
  * collapsed), and `is_current`. The warehouse twin of the reference's
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
    // first row per key: every lag is null -> <=> is false -> changed,
    // so the running sum of __chg is a 1-based version number
    val versioned = df
      .withColumn("__chg", when(changed, 1L).otherwise(0L))
      .withColumn("__ver", sum(col("__chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // attrs are constant within a version (change is null-safe), so
    // min() reconstructs them; all-null stays null (min ignores nothing
    // it could keep)
    val collapsed = versioned
      .groupBy((keyCols :+ col("__ver")): _*)
      .agg(min(col(tsCol)).as("valid_from"),
        (attrs.map(a => min(col(a)).as(a)) :+
          count(lit(1)).as("n_rows")): _*)
    val wv = Window.partitionBy(keyCols: _*).orderBy(col("__ver").asc)
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .select((keyCols :+ col("__ver").as("version_no")) ++
        attrs.map(col) ++ Seq(col("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"), col("n_rows")): _*)
  }
}
