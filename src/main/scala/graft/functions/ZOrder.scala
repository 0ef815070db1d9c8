package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast,
  Expression, Literal, ShiftLeft, ShiftRight}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton) multi-dimensional clustering — the data-LAYOUT
  * optimization a 100 TB table needs for selective multi-column range
  * scans (the OPTIMIZE ZORDER idea popularized by Delta Lake; Morton,
  * "A computer oriented geodetic data base", 1966). Interleaving the
  * bits of two quantized dimensions into one sort key makes rows that
  * are close in BOTH dimensions land in the same parquet row groups,
  * so the scan's min/max footer statistics prune a conjunctive range
  * predicate on either (or both) dimensions — a lexicographic sort
  * prunes only its leading column.
  *
  * The interleave is a static expansion of shift/mask/or terms — plain
  * Catalyst expressions, whole-stage-codegen'd, bit-identical in any
  * engine (no UDF, no float). Layout work is a one-off
  * `repartitionByRange` + within-partition sort on the key: one range
  * exchange over the table, exactly what any clustering rewrite costs.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative
    * dimension values: bit i of `x` lands at key bit 2i, bit i of `y`
    * at 2i+1. Values are masked to `bits` first, so out-of-range
    * inputs wrap rather than corrupt neighboring bits; quantize
    * (bucket/scale) real columns to [0, 2^bits) before calling.
    * `bits` <= 31 keeps the 2·bits-bit key inside a long. Defined at
    * the Catalyst `Expression` level so the SQL surface (`zorder2` via
    * [[graft.plans.GraftExtensions]]) and the Column API share one
    * implementation. */
  def interleave2Expr(x: Expression, y: Expression, bits: Int): Expression = {
    require(bits >= 1 && bits <= 31, s"bits=$bits must be in [1, 31]")
    val mask = Literal((1L << bits) - 1)
    val xm = BitwiseAnd(Cast(x, LongType), mask)
    val ym = BitwiseAnd(Cast(y, LongType), mask)
    (0 until bits).map { i =>
      BitwiseOr(
        ShiftLeft(BitwiseAnd(ShiftRight(xm, Literal(i)), Literal(1L)),
          Literal(2 * i)),
        ShiftLeft(BitwiseAnd(ShiftRight(ym, Literal(i)), Literal(1L)),
          Literal(2 * i + 1)))
    }.reduce[Expression](BitwiseOr(_, _))
  }

  def interleave2(x: Column, y: Column, bits: Int): Column =
    column(interleave2Expr(expression(x), expression(y), bits))

  /** Rewrite `df` into a z-order-clustered layout: range-partition by
    * the interleaved key (so each output file owns a contiguous z-range
    * — tight per-file min/max on BOTH dimensions) and sort within
    * partitions (so each parquet ROW GROUP is tight too). Write the
    * result with small-enough row groups and the scan prunes 2-D boxes;
    * the spec measures the effect against a lexicographic layout. */
  def cluster(df: DataFrame, xCol: String, yCol: String, bits: Int,
      numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, s"numPartitions=$numPartitions must be >= 1")
    val keyed = df.withColumn("__z",
      interleave2(col(xCol), col(yCol), bits))
    keyed.repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
