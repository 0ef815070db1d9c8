package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single right row with
  * the greatest `tsCol` <= the left row's, per join key (time-series
  * enrichment / attribution; an operator Spark has no native form of,
  * while DuckDB's ASOF JOIN oracles it directly).
  *
  * Shape: ONE shuffle of both sides together on `keys`, then a per-key
  * ordered window carrying the last non-null right payload forward —
  * never a per-row range probe, never an inequality join (Spark plans
  * those as broadcast-nested-loop), never a cross product. Right rows
  * sort before left rows at equal timestamps, so "<=" matches ties.
  * Cost is the sort behind the window: O(n log n) within each key's
  * partition slice, the same price as any windowed rollup; a hot key
  * concentrates its own events, nothing else.
  *
  * Determinism: the right side is first reduced to one row per
  * (keys, ts) — the lexicographically greatest payload struct wins
  * (field order = `payloadCols` order), so callers wanting argmax-by-id
  * semantics put the id first. With that reduction the window order
  * (ts, side) is a total order over rows that can affect a result, and
  * the output is engine-reproducible.
  *
  * Nulls: right rows with a null `tsCol` are dropped (they can never
  * be "at or before" anything); left rows with a null `tsCol` pass
  * through with null payload — exactly DuckDB's `ASOF LEFT JOIN`
  * behavior, where a null comparison matches nothing but the LEFT
  * side keeps the row.
  */
object AsofJoin {

  /** @param left        rows to enrich (all its columns pass through)
    * @param right       rows supplying the payload
    * @param keys        equi-join key columns (present on both sides)
    * @param tsCol       ordering column (present on both sides; any
    *                    orderable type — raw epoch-nanos longs keep
    *                    cross-engine parity exact)
    * @param payloadCols right columns to attach
    * @param outPrefix   prefix for attached columns (null when no
    *                    right row is at-or-before the left row)
    * @param maxGap      attribution window: a match additionally needs
    *                    left.ts - right.ts <= maxGap (requires a
    *                    numeric `tsCol`). The latest at-or-before row
    *                    is the closest one, so if IT fails the gap no
    *                    earlier row can pass — the backward scan stays
    *                    correct, the stale match just nulls out.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      outPrefix: String = "asof_", maxGap: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "at least one join key is required")
    require(payloadCols.nonEmpty, "at least one payload column is required")
    require(maxGap.forall(_ >= 0), s"maxGap=$maxGap must be >= 0")
    require(!payloadCols.contains("__rts"), "__rts is reserved")
    val keyCols = keys.map(col)
    // null-ts right rows can never match; left null-ts rows need no
    // filter — ascending order sorts them before every right row, so
    // the carried payload is naturally null (ASOF LEFT semantics)
    // __rts (the right ts, read by the gap check) rides first in the
    // payload struct only when maxGap is set, so the None path shuffles
    // no extra bytes; it is constant within a (keys, ts) group, so the
    // lexicographic max still reduces by payload order
    val payFields =
      if (maxGap.isDefined) col(tsCol).as("__rts") +: payloadCols.map(col)
      else payloadCols.map(col)
    val r1 = right.where(col(tsCol).isNotNull)
      .groupBy((keyCols :+ col(tsCol)): _*)
      .agg(max(struct(payFields: _*)).as("__pay"))
    val payType = r1.schema("__pay").dataType
    val lrowType = org.apache.spark.sql.types.StructType(left.schema.fields)
    val l2 = left.select(keyCols ++ Seq(col(tsCol), lit(1).as("__side"),
      lit(null).cast(payType).as("__pay"),
      struct(left.columns.map(col): _*).as("__lrow")): _*)
    val r2 = r1.select(keyCols ++ Seq(col(tsCol), lit(0).as("__side"),
      col("__pay"),
      lit(null).cast(lrowType).as("__lrow")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.unionByName(r2)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val inWindow = maxGap match {
      case Some(g) => col(tsCol) - col("__m.__rts") <= g
      case None => col("__m").isNotNull
    }
    matched.select(left.columns.map(c => col(s"__lrow.`$c`").as(c)) ++
      payloadCols.map(c =>
        when(inWindow, col(s"__m.`$c`")).as(s"$outPrefix$c")): _*)
  }
}
