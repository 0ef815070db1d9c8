package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins — for every left row, the single right row closest in
  * `tsCol` per join key (time-series enrichment / attribution; an
  * operator family Spark has no native form of, while DuckDB's ASOF
  * JOIN oracles it directly — forward via negated timestamps).
  *
  * Three variants share one kernel:
  *  - [[asofBackward]]: greatest right ts <= left ts (last-touch);
  *  - [[asofForward]]:  smallest right ts >= left ts (next-touch);
  *  - [[asofNearest]]:  whichever of the two is closer, ties to the
  *    backward match (requires a numeric ts).
  *
  * Shape: ONE shuffle of both sides together on `keys`, then per-key
  * ordered window(s) carrying the adjacent non-null right payload —
  * never a per-row range probe, never an inequality join (Spark plans
  * those as broadcast-nested-loop), never a cross product. Nearest
  * runs BOTH direction windows over the SAME exchange (two sorts, one
  * shuffle). Right rows sort adjacent to left rows at equal
  * timestamps, so "<="/" >=" match ties. Cost is the sort behind the
  * window: O(n log n) within each key's partition slice, the same
  * price as any windowed rollup; a hot key concentrates its own
  * events, nothing else.
  *
  * Determinism: the right side is first reduced to one row per
  * (keys, ts) — the lexicographically greatest payload struct wins
  * (field order = `payloadCols` order), so callers wanting argmax-by-id
  * semantics put the id first. With that reduction the window order
  * (ts, side) is a total order over rows that can affect a result, and
  * the output is engine-reproducible.
  *
  * Nulls: right rows with a null `tsCol` are dropped (they can never
  * be "at or before"/"at or after" anything); left rows with a null
  * `tsCol` pass through with null payload — exactly DuckDB's
  * `ASOF LEFT JOIN` behavior, where a null comparison matches nothing
  * but the LEFT side keeps the row.
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
      outPrefix: String = "asof_", maxGap: Option[Long] = None): DataFrame =
    asofDirected(left, right, keys, tsCol, payloadCols, outPrefix, maxGap,
      forward = false)

  /** Mirror of [[asofBackward]]: the single right row with the SMALLEST
    * `tsCol` >= the left row's (next-touch attribution); `maxGap`
    * becomes right.ts - left.ts <= maxGap. Same kernel, reversed walk
    * order — the earliest at-or-after row is the closest one, so the
    * gap check on it alone stays correct. */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      outPrefix: String = "asof_", maxGap: Option[Long] = None): DataFrame =
    asofDirected(left, right, keys, tsCol, payloadCols, outPrefix, maxGap,
      forward = true)

  /** The closer of the backward and forward matches, per left row —
    * |left.ts - right.ts| minimized, EXACT TIES TO BACKWARD (the
    * at-or-before row; an equal-ts right row is a backward tie-match,
    * distance 0). Requires a NUMERIC `tsCol` (distances are compared
    * by subtraction). `maxGap` bounds the absolute distance on both
    * sides; since the per-direction candidate is that direction's
    * closest, a candidate outside the gap means that whole direction
    * is outside it. Both direction windows run over ONE exchange of
    * the unioned sides (two sorts, one shuffle). */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String],
      outPrefix: String = "asof_", maxGap: Option[Long] = None): DataFrame = {
    require(maxGap.forall(_ >= 0), s"maxGap=$maxGap must be >= 0")
    val (l2, r2, keyCols) =
      unionSides(left, right, keys, tsCol, payloadCols, needRts = true)
    val wb = dirWindow(keyCols, col(tsCol), forward = false)
    val wf = dirWindow(keyCols, col(tsCol), forward = true)
    val matched = l2.unionByName(r2)
      .withColumn("__mb", last(col("__pay"), ignoreNulls = true).over(wb))
      .withColumn("__mf", last(col("__pay"), ignoreNulls = true).over(wf))
      .where(col("__side") === 1)
    val db = col(tsCol) - col("__mb.__rts") // >= 0 when __mb matches
    val df_ = col("__mf.__rts") - col(tsCol) // >= 0 when __mf matches
    def inGap(d: Column): Column = maxGap match {
      case Some(g) => d <= g
      case None => lit(true)
    }
    val bOk = col("__mb").isNotNull && inGap(db)
    val fOk = col("__mf").isNotNull && inGap(df_)
    val useB = bOk && (!fOk || db <= df_)
    matched.select(left.columns.map(c => col(s"__lrow.`$c`").as(c)) ++
      payloadCols.map(c =>
        when(useB, col(s"__mb.`$c`"))
          .when(fOk, col(s"__mf.`$c`")).as(s"$outPrefix$c")): _*)
  }

  private def asofDirected(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String, payloadCols: Seq[String],
      outPrefix: String, maxGap: Option[Long], forward: Boolean): DataFrame = {
    require(maxGap.forall(_ >= 0), s"maxGap=$maxGap must be >= 0")
    val (l2, r2, keyCols) =
      unionSides(left, right, keys, tsCol, payloadCols, maxGap.isDefined)
    val w = dirWindow(keyCols, col(tsCol), forward)
    val matched = l2.unionByName(r2)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val inWindow = maxGap match {
      case Some(g) if forward => col("__m.__rts") - col(tsCol) <= g
      case Some(g) => col(tsCol) - col("__m.__rts") <= g
      case None => col("__m").isNotNull
    }
    matched.select(left.columns.map(c => col(s"__lrow.`$c`").as(c)) ++
      payloadCols.map(c =>
        when(inWindow, col(s"__m.`$c`")).as(s"$outPrefix$c")): _*)
  }

  /** The per-direction walk order: ascending ts for backward, descending
    * for forward — in BOTH cases left null-ts rows sort FIRST (before
    * any right row, so their carried payload is naturally null) and a
    * right row sorts before a left row at its exact ts (side 0 < 1, so
    * ties match). `last(ignoreNulls).over` then yields, at each left
    * row, the payload of the nearest right row at-or-before (asc) /
    * at-or-after (desc) it. */
  private def dirWindow(keyCols: Seq[Column], ts: Column, forward: Boolean) =
    Window.partitionBy(keyCols: _*)
      .orderBy(if (forward) ts.desc_nulls_first else ts.asc_nulls_first,
        col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** Builds the two union legs: left rows carry their full row as a
    * struct (side 1); right rows reduce to one deterministic payload
    * struct per (keys, ts) (side 0). __rts (the right ts, read by gap
    * and distance checks) rides first in the payload struct only when
    * needed, so the plain path shuffles no extra bytes; it is constant
    * within a (keys, ts) group, so the lexicographic max still reduces
    * by payload order. */
  private def unionSides(left: DataFrame, right: DataFrame,
      keys: Seq[String], tsCol: String, payloadCols: Seq[String],
      needRts: Boolean): (DataFrame, DataFrame, Seq[Column]) = {
    require(keys.nonEmpty, "at least one join key is required")
    require(payloadCols.nonEmpty, "at least one payload column is required")
    require(!payloadCols.contains("__rts"), "__rts is reserved")
    val keyCols = keys.map(col)
    val payFields =
      if (needRts) col(tsCol).as("__rts") +: payloadCols.map(col)
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
    (l2, r2, keyCols)
  }
}
